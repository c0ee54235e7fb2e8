"""Tracker zoo registry: one name -> (model, runtime, tracker) recipe.

The reference's equivalent surface is scattered per-tracker parameter
modules (pytracking/parameter/*/*.py, lib/test/parameter/vipt.py) and
benchmark.py model lists (RGBD|RGBT|RGBE/benchmark.py). Here every tracker
the framework supports is constructible by name; params default to random
init (load converted checkpoints via mmtrack_tpu.models.convert).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass
class TrackerRecipe:
    build: Callable      # (seed) -> tracker object (random-init params)
    modality: str        # rgbd | rgbt | rgbe | rgb | any
    family: str
    # frame composition the recipe expects (data/composition.py X_DTYPES);
    # eval drivers use this to build model inputs from (color, X) pairs
    composition: str = "rgbcolormap"


def _vipt(config_name: str):
    def build(seed=0, params=None):
        from mmtrack_tpu.config import vipt_experiment_config
        from mmtrack_tpu.models.vipt import build_viptrack
        from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime, ViPTTracker
        cfg = vipt_experiment_config(config_name)
        model = build_viptrack(cfg)
        rt = ViPTRuntime.from_config(cfg)
        if params is None:
            z = jnp.zeros((1, cfg.DATA.TEMPLATE.SIZE, cfg.DATA.TEMPLATE.SIZE, 6))
            x = jnp.zeros((1, cfg.DATA.SEARCH.SIZE, cfg.DATA.SEARCH.SIZE, 6))
            params = jax.jit(lambda r: model.init(r, z, x, None, rt.ce_keep_lens))(
                jax.random.PRNGKey(seed))
        return ViPTTracker(model, params, rt)
    return build


def _ostrack():
    def build(seed=0, params=None):
        from mmtrack_tpu.models.vipt import build_ostrack
        from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime, ViPTTracker
        model = build_ostrack(template_size=128, search_size=256)
        rt = ViPTRuntime()
        if params is None:
            z = jnp.zeros((1, 128, 128, 3))
            x = jnp.zeros((1, 256, 256, 3))
            params = jax.jit(lambda r: model.init(r, z, x, None, rt.ce_keep_lens))(
                jax.random.PRNGKey(seed))
        return ViPTTracker(model, params, rt)
    return build


def _dimp(merge_type: str | None):
    def build(seed=0, params=None):
        from mmtrack_tpu.models.dimp import DiMPNet
        from mmtrack_tpu.trackers.dimp_tracker import DiMPRuntime, DiMPTracker
        model = DiMPNet(merge_type=merge_type)
        if params is None:
            im = jnp.zeros((1, 288, 288, 6))
            bb = jnp.asarray([[100.0, 100.0, 80.0, 80.0]])
            props = jnp.asarray([[[100.0, 100.0, 80.0, 80.0]] * 2])
            params = jax.jit(lambda r: model.init(r, im, im, bb, props))(
                jax.random.PRNGKey(seed))
        return DiMPTracker(model, params, DiMPRuntime())
    return build


def _prdimp():
    def build(seed=0, params=None):
        from mmtrack_tpu.models.dimp import build_prdimp50
        from mmtrack_tpu.trackers.dimp_tracker import (DiMPTracker,
                                                       prdimp50_runtime)
        model = build_prdimp50()
        if params is None:
            im = jnp.zeros((1, 352, 352, 6))
            bb = jnp.asarray([[120.0, 120.0, 100.0, 100.0]])
            props = jnp.asarray([[[120.0, 120.0, 100.0, 100.0]] * 2])
            params = jax.jit(lambda r: model.init(r, im, im, bb, props))(
                jax.random.PRNGKey(seed))
        return DiMPTracker(model, params, prdimp50_runtime())
    return build


def _atom(merge_type: str | None):
    """ATOM (pytracking/parameter/atom/default.py) and the DeT_ATOM_*
    RGBD variants: online factorized-conv classifier (GN-CG) + IoUNet."""
    def build(seed=0, params=None):
        from mmtrack_tpu.models.atom import ATOMNet
        from mmtrack_tpu.trackers.atom_tracker import ATOMRuntime, ATOMTracker
        model = ATOMNet(merge_type=merge_type)
        if params is None:
            im = jnp.zeros((1, 288, 288, 6))
            bb = jnp.asarray([[100.0, 100.0, 80.0, 80.0]])
            props = jnp.asarray([[[100.0, 100.0, 80.0, 80.0]] * 2])
            params = jax.jit(lambda r: model.init(r, im, bb, props))(jax.random.PRNGKey(seed))
        return ATOMTracker(model, params, ATOMRuntime())
    return build


def _keeptrack():
    def build(seed=0, params=None):
        from mmtrack_tpu.models.dimp import build_super_dimp50
        from mmtrack_tpu.trackers.keeptrack_tracker import (KeepTrackRuntime,
                                                            KeepTrackTracker)
        # super_dimp_hinge base network (keep_track/release.py:66)
        model = build_super_dimp50()
        if params is None:
            im = jnp.zeros((1, 288, 288, 6))
            bb = jnp.asarray([[100.0, 100.0, 80.0, 80.0]])
            props = jnp.asarray([[[100.0, 100.0, 80.0, 80.0]] * 2])
            params = jax.jit(lambda r: model.init(r, im, im, bb, props))(
                jax.random.PRNGKey(seed))
        return KeepTrackTracker(model, params, KeepTrackRuntime())
    return build


def _kys():
    """KYS: DiMP-50 + scene-propagation response fusion
    (keep_track_vot2021/ltr/models/tracking/kysnet.py:123-184,
    pytracking/tracker/kys/dimp_motion.py)."""
    def build(seed=0, params=None):
        from mmtrack_tpu.models.kys import build_kysnet
        from mmtrack_tpu.trackers.kys_tracker import KYSRuntime, KYSTracker
        model = build_kysnet()
        if params is None:
            im = jnp.zeros((1, 288, 288, 3))
            bb = jnp.asarray([[100.0, 100.0, 80.0, 80.0]])
            props = jnp.asarray([[[100.0, 100.0, 80.0, 80.0]] * 2])
            params = jax.jit(lambda r: model.init(r, im, im, bb, props,
                                                  method="init_forward"))(
                jax.random.PRNGKey(seed))
        return KYSTracker(model, params, KYSRuntime())
    return build


def _lwl():
    """LWL: few-shot segmentation target model + decoder
    (keep_track_vot2021/ltr/models/lwl/, pytracking/tracker/lwl/)."""
    def build(seed=0, params=None):
        from mmtrack_tpu.models.lwl import build_lwl_paper
        from mmtrack_tpu.trackers.lwl_tracker import LWLRuntime, LWLTracker
        model = build_lwl_paper()
        if params is None:
            im = jnp.zeros((1, 480, 480, 3))
            m = jnp.zeros((1, 480, 480))
            params = jax.jit(lambda r: model.init(r, im, im, m))(
                jax.random.PRNGKey(seed))
        return LWLTracker(model, params, LWLRuntime())
    return build


def _eco():
    """ECO (keep_track_vot2021/pytracking/tracker/eco + parameter/eco/
    default.py): Fourier-domain factorized correlation filters over
    resnet18_vggmconv1 features, optimized online by preconditioned
    GN-CG. Load converted resnet18_vggmconv1.pth weights via
    models/convert.convert_eco_backbone_checkpoint."""
    def build(seed=0, params=None):
        from mmtrack_tpu.models.backbones import resnet18_vggmconv1
        from mmtrack_tpu.trackers.eco_tracker import ECORuntime, ECOTracker
        model = resnet18_vggmconv1()
        if params is None:
            x = jnp.zeros((1, 208, 208, 3))
            params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(seed))
        return ECOTracker(model, params, ECORuntime())
    return build


def _ccot():
    """C-COT (keep_track_vot2021/pytracking/tracker/ccot): ECO's
    unfactorized predecessor — full-channel continuous filters, CG every
    frame."""
    def build(seed=0, params=None):
        from mmtrack_tpu.models.backbones import resnet18_vggmconv1
        from mmtrack_tpu.trackers.ccot_tracker import CCOTTracker, ccot_runtime
        model = resnet18_vggmconv1()
        if params is None:
            x = jnp.zeros((1, 208, 208, 3))
            params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(seed))
        return CCOTTracker(model, params, ccot_runtime())
    return build


def _mosse():
    """MOSSE (keep_track_vot2021/pytracking/tracker/mosse): classic
    closed-form grayscale correlation filter; no learned parameters."""
    def build(seed=0, params=None):
        from mmtrack_tpu.trackers.mosse_tracker import MOSSETracker
        return MOSSETracker()
    return build


def _stm():
    """STM (keep_track_vot2021/pytracking/tracker/stm): space-time memory
    mask tracking (Oh et al. ICCV'19, the fork's vendored copy)."""
    def build(seed=0, params=None):
        from mmtrack_tpu.models.stm import build_stm
        from mmtrack_tpu.trackers.stm_tracker import STMRuntime, STMTracker
        model = build_stm()
        if params is None:
            f = jnp.zeros((1, 384, 384, 3))
            m = jnp.zeros((1, 384, 384))
            params = jax.jit(lambda r: model.init(r, f, m))(
                jax.random.PRNGKey(seed))
        return STMTracker(model, params, STMRuntime())
    return build


def _scsrdcf():
    """SCSRDCF (keep_track_vot2021/pytracking/tracker/scsrdcf): SRDCF-style
    spatially-regularized DCF solved by frequency-domain SOR."""
    def build(seed=0, params=None):
        from mmtrack_tpu.trackers.scsrdcf_tracker import SCSRDCFTracker
        return SCSRDCFTracker()
    return build


def _siamfc():
    def build(seed=0, params=None):
        from mmtrack_tpu.models.siamfc import SiamFC
        from mmtrack_tpu.trackers.siamfc_tracker import SiamFCRuntime, SiamFCTracker
        model = SiamFC()
        if params is None:
            z = jnp.zeros((1, 127, 127, 6))
            x = jnp.zeros((1, 255, 255, 6))
            params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(seed))
        return SiamFCTracker(model, params, SiamFCRuntime())
    return build


def _mdnet(mode: str, vital: bool = False, manet: bool = False):
    def build(seed=0, params=None):
        from mmtrack_tpu.models.mdnet import MDNet
        from mmtrack_tpu.trackers.mdnet_tracker import MDNetRuntime, MDNetTracker
        # pyVITAL merges the two streams into fc6 by SUM (model.py:67,137)
        # where pyMDNet concatenates
        model = MDNet(mode=mode, fc6_merge="sum" if vital else "concat")
        if params is None:
            x = jnp.zeros((1, 107, 107, 6))
            params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(seed))
        if manet:
            # MANet's published online protocol (tracking/options.py +
            # run_tracker.py): 512 candidates, init 500/5000 x 30 iters at
            # lr 1e-4, updates at lr 2e-4 with a 20-frame short window and
            # 10-frame long interval, sum-form BinaryLoss, memories seeded
            # from the init-set slices (:180-181), result reverted to the
            # previous frame at failure with a hard trans_f_expand spread
            # (:237-256)
            rt = MDNetRuntime(
                n_samples=512, lr_init=1e-4, init_iters=30, lr_update=2e-4,
                n_frames_short=20, long_interval=10,
                scale_pos=1.2, trans_neg=1.5, scale_neg=1.2,
                trans_neg_init=1.0, scale_neg_init=2.0, scale_bbreg=1.5,
                loss_sum=True, manet_seed_memory=True, bbreg_reject=True,
                revert_on_failure=True, hard_trans_expand=True)
        elif vital:
            # pyVITAL's published constants (tracking/options.yaml): focal
            # BCE for init AND online updates (modules/model.py:159-171),
            # lr_init 5e-3, lr_update 5e-4, lr_g 2e-4
            rt = MDNetRuntime(vital=True, loss_focal=True,
                              lr_init=5e-3, lr_update=5e-4, lr_g=2e-4)
        else:
            rt = MDNetRuntime()
        return MDNetTracker(model, params, rt)
    return build


def _rgbt_chassis(model_cls):
    def build(seed=0, params=None):
        from mmtrack_tpu.trackers.mdnet_tracker import MDNetRuntime, MDNetTracker
        model = model_cls()
        if params is None:
            x = jnp.zeros((1, 107, 107, 6))
            params = jax.jit(lambda r: model.init(r, x))(jax.random.PRNGKey(seed))
        return MDNetTracker(model, params, MDNetRuntime())
    return build


def _apfnet():
    from mmtrack_tpu.models.apfnet import APFNet
    return _rgbt_chassis(APFNet)


def _dafnet():
    from mmtrack_tpu.models.rgbt_fusion import DAFNet
    return _rgbt_chassis(DAFNet)


def _macnet():
    from mmtrack_tpu.models.rgbt_fusion import MaCNet
    return _rgbt_chassis(MaCNet)


def _stark(six_channel: bool, dynamic: bool):
    def build(seed=0, params=None):
        from mmtrack_tpu.models.stark import STARK
        from mmtrack_tpu.trackers.stark_tracker import STARKRuntime, STARKTracker
        model = STARK(six_channel=six_channel, score_head=dynamic)
        C = 6 if six_channel else 3
        if params is None:
            z = jnp.zeros((1, 128, 128, C))
            x = jnp.zeros((1, 320, 320, C))
            params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(seed))
        return STARKTracker(model, params, STARKRuntime(dynamic_template=dynamic))
    return build


def _mixformer(scales: tuple[float, ...] = (1.0,), online_size: int = 3):
    """Reference-scale MixFormer_RGBD (CVT dims 192/768/1024, depths 2/2/12,
    baseline_large.yaml); online_size=3 matches TEST.ONLINE_SIZES.VOT2022RGBD."""
    def build(seed=0, params=None):
        from mmtrack_tpu.models.mixformer import build_mixformer_rgbd
        from mmtrack_tpu.trackers.mixformer_tracker import (MixFormerRuntime,
                                                            MixFormerTracker)
        model = build_mixformer_rgbd()
        if params is None:
            z = jnp.zeros((1, 128, 128, 6))
            x = jnp.zeros((1, 320, 320, 6))
            params = jax.jit(lambda r: model.init(r, z, z, x))(jax.random.PRNGKey(seed))
        return MixFormerTracker(model, params,
                                MixFormerRuntime(scale_factors=scales,
                                                 online_size=online_size))
    return build


def _ostrack_online():
    """OSTrack-online: dual-template OSTrack + ScoreTransformer-gated
    refresh (RGBD/models/OSTrack ostrack_online.py); the vot22 RGBD entry
    feeds color frames only."""
    def build(seed=0, params=None):
        from mmtrack_tpu.models.vipt import ScoreTransformer, build_ostrack
        from mmtrack_tpu.trackers.ostrack_online import (OSTrackOnlineRuntime,
                                                         OSTrackOnlineTracker)
        # published online-entry scale: search 320 / factor 5, t2m12 cls
        # head (experiments/ostrack/ostrack320_elimination_cls_t2m12_ep50)
        model = build_ostrack(template_size=128, search_size=320)
        rt = OSTrackOnlineRuntime()
        if params is None:
            z = jnp.zeros((1, 128, 128, 3))
            x = jnp.zeros((1, 320, 320, 3))
            params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(seed))
        cls = ScoreTransformer(d_model=768, n_layers=rt.cls_attn_layers,
                               n_mlp_layers=rt.cls_mlp_layers)
        lens_zx = (128 // 16) ** 2 + rt.feat_sz * rt.feat_sz
        toks = jnp.zeros((1, lens_zx, 768))
        cls_params = jax.jit(lambda r: cls.init(r, toks, jnp.zeros((1, 4))))(
            jax.random.PRNGKey(seed + 1))
        return OSTrackOnlineTracker(model, params, cls_params, rt)
    return build


def _promixtrack():
    def build(seed=0, params=None):
        from mmtrack_tpu.models.mixformer import build_mixformer_rgbd
        from mmtrack_tpu.trackers.mixformer_tracker import (MixFormerRuntime,
                                                            MixFormerTracker)
        model = build_mixformer_rgbd(in_channels=3)
        if params is None:
            z = jnp.zeros((1, 128, 128, 3))
            x = jnp.zeros((1, 320, 320, 3))
            params = jax.jit(lambda r: model.init(r, z, z, x))(jax.random.PRNGKey(seed))
        return MixFormerTracker(model, params,
                                MixFormerRuntime(online_size=3,
                                                 re_constrain="none"))
    return build


TRACKER_REGISTRY: dict[str, TrackerRecipe] = {
    # ViPT family (the flagship)
    "vipt_deep_rgbd": TrackerRecipe(_vipt("deep_rgbd"), "rgbd", "vipt"),
    "vipt_deep_rgbt": TrackerRecipe(_vipt("deep_rgbt"), "rgbt", "vipt"),
    "vipt_deep_rgbe": TrackerRecipe(_vipt("deep_rgbe"), "rgbe", "vipt"),
    "vipt_shaw_rgbd": TrackerRecipe(_vipt("shaw_rgbd"), "rgbd", "vipt"),
    "vipt_shaw_rgbt": TrackerRecipe(_vipt("shaw_rgbt"), "rgbt", "vipt"),
    "vipt_shaw_rgbe": TrackerRecipe(_vipt("shaw_rgbe"), "rgbe", "vipt"),
    "ostrack": TrackerRecipe(_ostrack(), "rgb", "ostrack"),
    "ostrack_online": TrackerRecipe(_ostrack_online(), "rgbd", "ostrack",
                                    composition="color"),
    # DiMP family
    "dimp50": TrackerRecipe(_dimp(None), "rgb", "dimp"),
    "det_dimp50_max": TrackerRecipe(_dimp("max"), "rgbd", "dimp"),
    "det_dimp50_mean": TrackerRecipe(_dimp("mean"), "rgbd", "dimp"),
    "det_dimp50_mul": TrackerRecipe(_dimp("mul"), "rgbd", "dimp"),
    "det_dimp50_weightedsum": TrackerRecipe(_dimp("weightedSum"), "rgbd", "dimp"),
    "det_dimp50_mc": TrackerRecipe(_dimp("conv"), "rgbd", "dimp"),
    # mfDiMP: end-to-end RGB-T fusion DiMP (readme.md:33-39; empty submodule
    # in the reference) == the dual-backbone DeT recipe fed rgbrgb thermal
    # composition
    "mfdimp": TrackerRecipe(_dimp("mean"), "rgbt", "dimp",
                            composition="rgbrgb"),
    # ATOM family (pytracking parameter/atom + DeT_ATOM_{Max,Mean,MC})
    "prdimp50": TrackerRecipe(_prdimp(), "rgb", "dimp"),
    "atom": TrackerRecipe(_atom(None), "rgb", "dimp"),
    "det_atom_max": TrackerRecipe(_atom("max"), "rgbd", "dimp"),
    "det_atom_mean": TrackerRecipe(_atom("mean"), "rgbd", "dimp"),
    "det_atom_mc": TrackerRecipe(_atom("conv"), "rgbd", "dimp"),
    "keep_track": TrackerRecipe(_keeptrack(), "rgb", "dimp"),
    # KYS: scene-propagation state fused into the DiMP score
    # (keep_track fork, ltr/models/motion + pytracking/tracker/kys)
    "kys": TrackerRecipe(_kys(), "rgb", "dimp"),
    # LWL: few-shot segmentation (VOS) tracker (keep_track fork)
    "lwl": TrackerRecipe(_lwl(), "rgb", "lwl"),
    # STM: space-time memory mask tracking (keep_track fork, vendored)
    "stm": TrackerRecipe(_stm(), "rgb", "lwl"),
    # ECO (the keep_track fork's DCF family; also shipped by every
    # AR-external fork, e.g. SPT/external/AR/pytracking/tracker/eco)
    "eco": TrackerRecipe(_eco(), "rgb", "eco", composition="color"),
    "ccot": TrackerRecipe(_ccot(), "rgb", "eco", composition="color"),
    "mosse": TrackerRecipe(_mosse(), "rgb", "eco", composition="color"),
    "scsrdcf": TrackerRecipe(_scsrdcf(), "rgb", "eco", composition="color"),
    # classic zoo
    "siamfc": TrackerRecipe(_siamfc(), "rgbe", "siamfc"),
    "mdnet": TrackerRecipe(_mdnet("single"), "rgb", "mdnet"),
    "pymdnet": TrackerRecipe(_mdnet("dual"), "rgbe", "mdnet"),
    # pyVITAL: dual MDNet + adversarial GNet masking in the online protocol
    # (g_pretrain at init + masked positives + G updates; models/vital.py)
    "pyvital": TrackerRecipe(_mdnet("dual", vital=True), "rgbe", "mdnet"),
    "manet": TrackerRecipe(_mdnet("adapter", manet=True), "rgbe", "mdnet"),
    "apfnet": TrackerRecipe(_apfnet(), "rgbt", "mdnet"),
    "dafnet": TrackerRecipe(_dafnet(), "rgbt", "mdnet"),
    "macnet": TrackerRecipe(_macnet(), "rgbt", "mdnet"),
    # transformer zoo
    "stark_s": TrackerRecipe(_stark(False, False), "rgb", "stark"),
    "stark_st": TrackerRecipe(_stark(False, True), "rgb", "stark"),
    "spt": TrackerRecipe(_stark(True, False), "rgbd", "stark"),
    "mixformer_rgbd": TrackerRecipe(_mixformer(), "rgbd", "mixformer"),
    # SAMF: scale-adaptive MixFormer (RGBD/models/SAMF README)
    "samf": TrackerRecipe(_mixformer((0.8, 1.0, 1.25)), "rgbd", "mixformer"),
    # ProMixTrack (RGBD/models/ProMixTrack): the VANILLA RGB MixFormer-L run
    # on an rgbd_blend composition (5% JET-colormapped-depth alpha blend into
    # the color frame, promix_vot2022_rgbd.py:84-115), no re-constraint; its
    # VOT entry adds Alpha-Refine masks.
    "promixtrack": TrackerRecipe(_promixtrack(), "rgbd", "mixformer",
                                 composition="rgbd_blend"),
}


def build_tracker(name: str, seed: int = 0, params=None):
    if name not in TRACKER_REGISTRY:
        raise KeyError(f"unknown tracker '{name}'; options: "
                       f"{sorted(TRACKER_REGISTRY)}")
    return TRACKER_REGISTRY[name].build(seed=seed, params=params)


def list_trackers(modality: str | None = None) -> list[str]:
    return sorted(n for n, r in TRACKER_REGISTRY.items()
                  if modality is None or r.modality in (modality, "any"))
