from mmtrack_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from mmtrack_tpu.parallel.batched_eval import make_batched_track_step, BatchedViPTTracker
