"""Import helpers for running the reference's torch models on CPU.

The environment has no real tracker checkpoints and no network, so the
strongest obtainable parity evidence is: instantiate the reference's own
torch model code (under /root/reference) at full published scale, convert
its *actual* state_dict through mmtrack_tpu's converters, and assert that
the two frameworks produce the same outputs on the same inputs. That
exercises every weight tensor and every layer's numerics end to end —
exactly what loading a trained .pth would exercise, minus the trained
values themselves.

The reference needs `timm` and `easydict`, which are not installed; a
minimal shim (tools/parity/shim) provides the handful of symbols used.
"""

from __future__ import annotations

import contextlib
import importlib
import os
import sys

SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shim")
REFERENCE_ROOT = os.environ.get("MMTRACK_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "ViPT", "lib"))


def patch_cuda_to_cpu():
    """The reference hard-codes .cuda() in a few module __init__s (e.g.
    Corner_Predictor's coordinate grids, MixFormer head.py:49-53). This box
    has CPU-only torch; make .cuda() a no-op so those modules build. Only
    the parity harness imports this."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def patch_legacy_fft():
    """torch>=1.8 removed the old torch.rfft/irfft (real tensors with a
    trailing real/imag pair, onesided half spectra) that pytracking's
    fourier/dcf libs are written against (keep_track_vot2021/pytracking/
    libs/fourier.py:24,31, dcf.py:134,139). Recreate them on torch.fft
    with the legacy call signatures used there."""
    import torch

    if hasattr(torch, "rfft"):
        return
    import torch.fft as tfft

    def rfft(input, signal_ndim, normalized=False, onesided=True):
        norm = "ortho" if normalized else "backward"
        dims = tuple(range(-signal_ndim, 0))
        c = (tfft.rfftn if onesided else tfft.fftn)(input, dim=dims,
                                                    norm=norm)
        return torch.view_as_real(c)

    def irfft(input, signal_ndim, normalized=False, onesided=True,
              signal_sizes=None):
        norm = "ortho" if normalized else "backward"
        dims = tuple(range(-signal_ndim, 0))
        c = torch.view_as_complex(input.contiguous())
        if onesided:
            s = None if signal_sizes is None else tuple(signal_sizes)
            return tfft.irfftn(c, s=s, dim=dims, norm=norm)
        return tfft.ifftn(c, dim=dims, norm=norm).real

    torch.rfft = rfft
    torch.irfft = irfft


@contextlib.contextmanager
def reference_path(subdir: str):
    """Temporarily put the shim + one reference project root on sys.path.

    Different reference projects all use a top-level `lib` package, so any
    previously imported `lib.*` modules are evicted on entry AND exit to
    keep projects from cross-contaminating.
    """
    root = os.path.join(REFERENCE_ROOT, subdir)
    if not os.path.isdir(root):
        raise FileNotFoundError(root)

    def _evict():
        for name in [n for n in sys.modules
                     if n.split(".")[0] in ("lib", "ltr", "pytracking", "external")]:
            del sys.modules[name]

    _evict()
    sys.path.insert(0, root)
    sys.path.insert(0, SHIM_DIR)
    try:
        yield root
    finally:
        for p in (SHIM_DIR, root):
            with contextlib.suppress(ValueError):
                sys.path.remove(p)
        _evict()


def load_vipt_reference(variant: str = "deep_rgbd"):
    """Build the reference ViPTrack (torch, CPU, eval) for one experiment.

    Mirrors lib/test/parameter/vipt.py:7-29 minus checkpoint load: default
    config + experiments/vipt/<variant>.yaml overlay, build_viptrack(cfg,
    training=False).
    """
    import torch

    with reference_path("ViPT") as root:
        cfg_mod = importlib.import_module("lib.config.vipt.config")
        importlib.reload(cfg_mod)  # reset defaults if called twice
        cfg_mod.update_config_from_file(
            os.path.join(root, "experiments", "vipt", f"{variant}.yaml"))
        ostrack_prompt = importlib.import_module("lib.models.vipt.ostrack_prompt")
        ce_utils = importlib.import_module("lib.utils.ce_utils")

        torch.manual_seed(0)
        model = ostrack_prompt.build_viptrack(cfg_mod.cfg, training=False)
        model.eval()

        # test-time CE template mask, as the test tracker builds it
        # (lib/test/tracker/vipt.py:49-55): template bbox centered in the crop
        # at 1/template_factor scale.
        tf = cfg_mod.cfg.TEST.TEMPLATE_FACTOR
        bbox = torch.tensor([[0.5 - 0.5 / tf, 0.5 - 0.5 / tf, 1 / tf, 1 / tf]])
        mask = ce_utils.generate_mask_cond(cfg_mod.cfg, 1, torch.device("cpu"), bbox)
        return model, cfg_mod.cfg, mask


def load_dimp_reference(merge_type: str | None = "max", filter_size: int = 4,
                        num_dist_bins: int = 100, bin_displacement: float = 0.1,
                        init_gauss_sigma: float = 0.9,
                        mask_init_factor: float = 3.0):
    """Build the reference DiMPnet / DiMPnet_DeT (torch, CPU, eval) with the
    dimp50 training-settings hyper-parameters (the published DiMP-50 config;
    dimpnet.py dimp50_DeT / dimpnet50). The CUDA PrRoIPool2D import inside
    ltr is satisfied by pre-registering the shim's CPU implementation."""
    import torch

    # torch._six was removed in torch>=2; ltr.data.loader still imports it
    if "torch._six" not in sys.modules:
        import types

        six = types.ModuleType("torch._six")
        six.string_classes = (str,)
        six.int_classes = (int,)
        sys.modules["torch._six"] = six

    with reference_path("RGBD/models/DeT"):
        # ltr.external.PreciseRoIPooling is a CUDA build; alias the shim's
        # exact CPU PrRoIPool2D under that name BEFORE atom_iou_net imports.
        import importlib as _il

        shim_pp = _il.import_module("external.PreciseRoIPooling.pytorch.prroi_pool")
        for alias in ("ltr.external", "ltr.external.PreciseRoIPooling",
                      "ltr.external.PreciseRoIPooling.pytorch",
                      "ltr.external.PreciseRoIPooling.pytorch.prroi_pool"):
            sys.modules[alias] = shim_pp

        dimpnet = importlib.import_module("ltr.models.tracking.dimpnet")
        torch.manual_seed(0)
        kwargs = dict(filter_size=filter_size, optim_iter=5,
                      backbone_pretrained=False,
                      out_feature_dim=512, init_gauss_sigma=init_gauss_sigma,
                      num_dist_bins=num_dist_bins,
                      bin_displacement=bin_displacement,
                      mask_init_factor=mask_init_factor, score_act="relu")
        if merge_type is None:
            model = dimpnet.dimpnet50(**kwargs)
        else:
            model = dimpnet.dimp50_DeT(merge_type=merge_type, **kwargs)
        model.eval()
        return model


def load_spt_reference(variant: str = "baseline", st: bool = False):
    """Build the reference SPT STARKS/STARKST (torch, CPU, eval) —
    SPT/lib/models/stark/stark_s.py build_starks at experiments/stark_s/
    baseline.yaml (dual ResNet-50, d=256, 6 enc per modality, 2 fusion,
    6 dec)."""
    import torch

    patch_cuda_to_cpu()
    with reference_path("RGBD/models/SPT") as root:
        # block the torchvision pretrained download in lib resnet builders
        misc = importlib.import_module("lib.utils.misc")
        misc.is_main_process = lambda: False

        sub = "stark_st2" if st else "stark_s"
        cfg_mod = importlib.import_module(f"lib.config.{sub}.config")
        importlib.reload(cfg_mod)
        cfg_mod.update_config_from_file(
            os.path.join(root, "experiments", sub, f"{variant}.yaml"))
        torch.manual_seed(0)
        if st:
            mod = importlib.import_module("lib.models.stark.stark_st")
            model = mod.build_starkst(cfg_mod.cfg)
        else:
            mod = importlib.import_module("lib.models.stark.stark_s")
            model = mod.build_starks(cfg_mod.cfg)
        model.eval()
        merge = importlib.import_module("lib.utils.merge")
        # hand back the same module objects the model bound (a re-import in
        # a later context would fail the NestedTensor isinstance check)
        return model, cfg_mod.cfg, misc, merge


def load_ostrack_reference(
        yaml_name: str = "ostrack320_elimination_cls_t2m12_ep50"):
    """Build the reference RGBD OSTrack (torch, CPU, eval) at the published
    online-entry configuration: lib/test/parameter/ostrack_online.py:7-30
    minus checkpoint load — default config + experiments/ostrack/<yaml>
    overlay, build_ostrack(cfg, training=False). That is ViT-B/16 with
    DropBlock token elimination at layers (3,6,9), keep 0.7, search 320 /
    template 128, CENTER head, and the ScoreTransformer cls head
    (t2m12: 2 class-attn layers, 12 MLP layers)."""
    import torch

    patch_cuda_to_cpu()
    with reference_path("RGBD/models/OSTrack") as root:
        cfg_mod = importlib.import_module("lib.config.ostrack.config")
        importlib.reload(cfg_mod)
        cfg_mod.update_config_from_file(
            os.path.join(root, "experiments", "ostrack", f"{yaml_name}.yaml"))
        ostrack_mod = importlib.import_module("lib.models.ostrack.ostrack")

        torch.manual_seed(0)
        model = ostrack_mod.build_ostrack(cfg_mod.cfg, training=False)
        model.eval()

        # CTR_POINT template mask (generate_mask_cond,
        # lib/train/actors/ostrack.py:23-43): one True token at the 8x8
        # template grid's (3,3) — built inline to avoid importing the
        # training actors package
        tfs = cfg_mod.cfg.DATA.TEMPLATE.SIZE // cfg_mod.cfg.MODEL.STRIDE
        assert tfs == 8 and cfg_mod.cfg.MODEL.BACKBONE.TEMPLATE_RANGE \
            == "CTR_POINT", (tfs, cfg_mod.cfg.MODEL.BACKBONE.TEMPLATE_RANGE)
        mask = torch.zeros((1, tfs, tfs))
        mask[:, 3:4, 3:4] = 1
        mask = mask.flatten(1).to(torch.bool)
        return model, cfg_mod.cfg, mask


def load_mixformer_reference(variant: str = "baseline_large"):
    """Build the reference MixFormerRGBDOnlineScore (torch, CPU, eval) at
    published scale (build_mixformer_rgbd_online_score, train=False skips
    checkpoint loading). The CUDA PrRoIPool2D is satisfied by the shim's
    exact CPU implementation."""
    import torch

    patch_cuda_to_cpu()
    root_sub = "RGBD/models/MixFormer_RGBD"
    with reference_path(root_sub) as root:
        cfg_mod = importlib.import_module("lib.config.mixformerrgbd_online.config")
        importlib.reload(cfg_mod)
        cfg_mod.update_config_from_file(
            os.path.join(root, "experiments", "mixformerrgbd_online",
                         f"{variant}.yaml"))
        model_mod = importlib.import_module(
            "lib.models.mixformer.mixformerrgbd_online")

        torch.manual_seed(0)
        model = model_mod.build_mixformer_rgbd_online_score(
            cfg_mod.cfg, train=False)
        model.eval()
        return model, cfg_mod.cfg
