from mmtrack_tpu.models.vipt import ViTCEPrompt, ViPTrack, build_viptrack
from mmtrack_tpu.models.heads import CenterPredictor, CornerPredictor, cal_bbox
