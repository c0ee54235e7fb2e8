from mmtrack_tpu.models.vipt import ViTCEPrompt, ViPTrack, build_viptrack, build_ostrack
from mmtrack_tpu.models.heads import CenterPredictor, CornerPredictor, cal_bbox
from mmtrack_tpu.models.resnet import ResNet, resnet18, resnet50
from mmtrack_tpu.models.dimp import DiMPNet, AtomIoUNet, build_dimp50, build_det_dimp50
from mmtrack_tpu.models.siamfc import SiamFC
from mmtrack_tpu.models.mdnet import MDNet
from mmtrack_tpu.models.apfnet import APFNet
from mmtrack_tpu.models.vital import GNet
from mmtrack_tpu.models.stark import STARK
from mmtrack_tpu.models.mixformer import MixFormer
from mmtrack_tpu.models.alpha_refine import AlphaRefineNet, ARcmSeg
from mmtrack_tpu.models.convert import convert_vipt_checkpoint, load_into
