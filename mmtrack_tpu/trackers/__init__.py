from mmtrack_tpu.trackers.vipt_tracker import ViPTTracker, vipt_init_state, vipt_track_step
