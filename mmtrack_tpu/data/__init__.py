from mmtrack_tpu.data.composition import get_x_frame, get_rgbd_frame, compose_x
from mmtrack_tpu.data.synthetic import make_synthetic_sequence
