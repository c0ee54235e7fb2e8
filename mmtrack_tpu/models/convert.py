"""Torch checkpoint -> flax parameter conversion for the ViPT/OSTrack family.

The reference ships .pth.tar checkpoints ({'net': state_dict},
base_trainer.py:116-148; ViPT loads OSTrack non-strict,
ostrack_prompt.py:138-141). This maps those names/layouts onto the
mmtrack_tpu flax tree:

  conv:  (O, I, kh, kw) -> (kh, kw, I, O)
  linear:(O, I)        -> (I, O)
  1x1 prompt convs     -> Dense kernels (I, O)
  BN running stats     -> FrozenBatchNorm mean/var parameters

The reference's vit.py itself contains timm's flax-npz -> torch loader
(_load_weights, ViPT/lib/models/vipt/vit.py:171+); this is its inverse for
our tree. Works on any mapping of torch names to numpy arrays — no torch
import required (tensors are accepted and `.numpy()`-ed if given).
"""

from __future__ import annotations

import re

import flax
import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv_kernel(w):
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _dense_kernel(w):
    return _np(w).T


def _conv1x1_to_dense(w):
    return _np(w)[:, :, 0, 0].T  # (O, I, 1, 1) -> (I, O)


def convert_vipt_checkpoint(state_dict: dict) -> dict:
    """torch ViPT/OSTrack state_dict -> flax params['params'] tree."""
    out: dict[tuple, np.ndarray] = {}

    def put(path: str, value):
        out[tuple(path.split("/"))] = value

    for name, t in state_dict.items():
        if name.startswith("backbone."):
            rest = name[len("backbone."):]

            m = re.match(r"patch_embed(_prompt)?\.proj\.(weight|bias)", rest)
            if m:
                mod = "patch_embed_prompt" if m.group(1) else "patch_embed"
                if m.group(2) == "weight":
                    put(f"backbone/{mod}/proj/kernel", _conv_kernel(t))
                else:
                    put(f"backbone/{mod}/proj/bias", _np(t))
                continue

            if rest in ("pos_embed_z", "pos_embed_x"):
                put(f"backbone/{rest}", _np(t))
                continue

            m = re.match(r"blocks\.(\d+)\.(.+)", rest)
            if m:
                i, sub = m.group(1), m.group(2)
                base = f"backbone/blocks_{i}"
                for ln in ("norm1", "norm2"):
                    if sub == f"{ln}.weight":
                        put(f"{base}/{ln}/scale", _np(t))
                    elif sub == f"{ln}.bias":
                        put(f"{base}/{ln}/bias", _np(t))
                if sub == "attn.qkv.weight":
                    put(f"{base}/attn/qkv/kernel", _dense_kernel(t))
                elif sub == "attn.qkv.bias":
                    put(f"{base}/attn/qkv/bias", _np(t))
                elif sub == "attn.proj.weight":
                    put(f"{base}/attn/proj/kernel", _dense_kernel(t))
                elif sub == "attn.proj.bias":
                    put(f"{base}/attn/proj/bias", _np(t))
                elif sub == "mlp.fc1.weight":
                    put(f"{base}/mlp/fc1/kernel", _dense_kernel(t))
                elif sub == "mlp.fc1.bias":
                    put(f"{base}/mlp/fc1/bias", _np(t))
                elif sub == "mlp.fc2.weight":
                    put(f"{base}/mlp/fc2/kernel", _dense_kernel(t))
                elif sub == "mlp.fc2.bias":
                    put(f"{base}/mlp/fc2/bias", _np(t))
                continue

            m = re.match(r"prompt_blocks\.(\d+)\.(conv0_0|conv0_1|conv1x1)\.(weight|bias)", rest)
            if m:
                i, conv, kind = m.groups()
                if kind == "weight":
                    put(f"backbone/prompt_blocks_{i}/{conv}/kernel",
                        _conv1x1_to_dense(t))
                else:
                    put(f"backbone/prompt_blocks_{i}/{conv}/bias", _np(t))
                continue

            m = re.match(r"prompt_blocks\.(\d+)\.fovea\.smooth", rest)
            if m:
                put(f"backbone/prompt_blocks_{m.group(1)}/fovea/smooth", _np(t))
                continue

            m = re.match(r"prompt_norms\.(\d+)\.(weight|bias)", rest)
            if m:
                i, kind = m.groups()
                leaf = "scale" if kind == "weight" else "bias"
                put(f"backbone/prompt_norms_{i}/{leaf}", _np(t))
                continue

            m = re.match(r"norm\.(weight|bias)", rest)
            if m:
                leaf = "scale" if m.group(1) == "weight" else "bias"
                put(f"backbone/norm/{leaf}", _np(t))
                continue

        m = re.match(r"box_head\.conv(\d)_(ctr|offset|size)\.(.+)", name)
        if m:
            k, branch, sub = m.groups()
            base = f"box_head/{branch}/conv{k}"
            if k == "5":
                if sub == "weight":
                    put(f"{base}/kernel", _conv_kernel(t))
                elif sub == "bias":
                    put(f"{base}/bias", _np(t))
                continue
            # ConvBNRelu: .0 conv, .1 BN
            if sub == "0.weight":
                put(f"{base}/conv/kernel", _conv_kernel(t))
            elif sub == "0.bias":
                put(f"{base}/conv/bias", _np(t))
            elif sub == "1.weight":
                put(f"{base}/bn/scale", _np(t))
            elif sub == "1.bias":
                put(f"{base}/bn/bias", _np(t))
            elif sub == "1.running_mean":
                put(f"{base}/bn/mean", _np(t))
            elif sub == "1.running_var":
                put(f"{base}/bn/var", _np(t))
            continue

        # CORNER head (HEAD.TYPE='CORNER': box_head.conv{k}_{tl,br}.*,
        # head.py Corner_Predictor) — same tower layout as the center head
        m = re.match(r"box_head\.conv(\d)_(tl|br)\.(.+)", name)
        if m:
            k, branch, sub = m.groups()
            base = f"box_head/{branch}/conv{k}"
            if k == "5":
                if sub == "weight":
                    put(f"{base}/kernel", _conv_kernel(t))
                elif sub == "bias":
                    put(f"{base}/bias", _np(t))
                continue
            if sub == "0.weight":
                put(f"{base}/conv/kernel", _conv_kernel(t))
            elif sub == "0.bias":
                put(f"{base}/conv/bias", _np(t))
            elif sub == "1.weight":
                put(f"{base}/bn/scale", _np(t))
            elif sub == "1.bias":
                put(f"{base}/bn/bias", _np(t))
            elif sub == "1.running_mean":
                put(f"{base}/bn/mean", _np(t))
            elif sub == "1.running_var":
                put(f"{base}/bn/var", _np(t))
            continue

        # MLP head (HEAD.TYPE='MLP': box_head.layers.N.{weight,bias})
        m = re.match(r"box_head\.layers\.(\d+)\.(weight|bias)", name)
        if m:
            i, leaf = m.groups()
            if leaf == "weight":
                put(f"box_head/layers_{i}/kernel", _np(t).T)
            else:
                put(f"box_head/layers_{i}/bias", _np(t))
            continue

    return flax.traverse_util.unflatten_dict(out)


def _dw_conv_kernel(w):
    return _np(w).transpose(2, 3, 1, 0)  # (C,1,kh,kw) -> (kh,kw,1,C)


def convert_mixformer_checkpoint(state_dict: dict) -> dict:
    """torch MixFormerRGBDOnlineScore state_dict -> flax params tree.

    Name surface: RGBD/models/MixFormer_RGBD/lib/models/mixformer/
    mixformerrgbd_online.py (CVT stages, corner head, ScoreDecoder). The
    unused classifier leftovers (backbone.norm / backbone.head) and BN
    num_batches_tracked are dropped, mirroring the reference's own
    non-strict load (build_mixformer_rgbd_online_score:957-969).
    """
    out: dict[tuple, np.ndarray] = {}

    def put(path: str, value):
        out[tuple(path.split("/"))] = value

    def put_ln(base: str, leaf: str, t):
        put(f"{base}/{'scale' if leaf == 'weight' else 'bias'}", _np(t))

    def put_bn(base: str, leaf: str, t):
        name = {"weight": "scale", "bias": "bias",
                "running_mean": "mean", "running_var": "var"}.get(leaf)
        if name:
            put(f"{base}/{name}", _np(t))

    for name, t in state_dict.items():
        m = re.match(r"(backbone(?:_depth)?)\.stage(\d)\.(.+)", name)
        if m:
            bk, si, rest = m.groups()
            base = f"{bk}/stage{si}"
            m2 = re.match(r"patch_embed\.proj\.(weight|bias)", rest)
            if m2:
                leaf = "kernel" if m2.group(1) == "weight" else "bias"
                v = _conv_kernel(t) if m2.group(1) == "weight" else _np(t)
                put(f"{base}/patch_embed/proj/{leaf}", v)
                continue
            m2 = re.match(r"patch_embed\.norm\.(weight|bias)", rest)
            if m2:
                put_ln(f"{base}/patch_embed/norm", m2.group(1), t)
                continue
            m2 = re.match(r"blocks\.(\d+)\.(.+)", rest)
            if not m2:
                continue
            j, sub = m2.groups()
            bb = f"{base}/blocks_{j}"
            for ln in ("norm1", "norm2"):
                m3 = re.match(rf"{ln}\.(weight|bias)", sub)
                if m3:
                    put_ln(f"{bb}/{ln}", m3.group(1), t)
            m3 = re.match(r"attn\.conv_proj_([qkv])\.conv\.weight", sub)
            if m3:
                put(f"{bb}/attn/conv_proj_{m3.group(1)}/conv/kernel",
                    _dw_conv_kernel(t))
                continue
            m3 = re.match(r"attn\.conv_proj_([qkv])\.bn\.(.+)", sub)
            if m3:
                put_bn(f"{bb}/attn/conv_proj_{m3.group(1)}/bn", m3.group(2), t)
                continue
            m3 = re.match(r"attn\.proj(_([qkv]))?\.(weight|bias)", sub)
            if m3:
                mod = f"proj_{m3.group(2)}" if m3.group(2) else "proj"
                if m3.group(3) == "weight":
                    put(f"{bb}/attn/{mod}/kernel", _dense_kernel(t))
                else:
                    put(f"{bb}/attn/{mod}/bias", _np(t))
                continue
            m3 = re.match(r"mlp\.(fc[12])\.(weight|bias)", sub)
            if m3:
                if m3.group(2) == "weight":
                    put(f"{bb}/mlp/{m3.group(1)}/kernel", _dense_kernel(t))
                else:
                    put(f"{bb}/mlp/{m3.group(1)}/bias", _np(t))
            continue

        m = re.match(r"box_head\.conv(\d)_(tl|br)\.(.+)", name)
        if m:
            k, branch, sub = m.groups()
            base = f"box_head/{branch}/conv{k}"
            if k == "5":
                if sub == "weight":
                    put(f"{base}/kernel", _conv_kernel(t))
                elif sub == "bias":
                    put(f"{base}/bias", _np(t))
            elif sub == "0.weight":
                put(f"{base}/conv/kernel", _conv_kernel(t))
            elif sub == "0.bias":
                put(f"{base}/conv/bias", _np(t))
            elif sub.startswith("1."):
                put_bn(f"{base}/bn", sub[2:], t)
            continue

        m = re.match(r"score_branch\.(.+)", name)
        if m:
            rest = m.group(1)
            if rest == "score_token":
                put("score_branch/score_token", _np(t))
                continue
            m2 = re.match(r"norm1\.(weight|bias)", rest)
            if m2:
                put_ln("score_branch/norm1", m2.group(1), t)
                continue
            m2 = re.match(r"norm2\.(\d)\.(weight|bias)", rest)
            if m2:
                put_ln(f"score_branch/norm2_{m2.group(1)}", m2.group(2), t)
                continue
            m2 = re.match(r"proj(_([qkv]))?\.(\d)\.(weight|bias)", rest)
            if m2:
                mod = f"proj_{m2.group(2)}_{m2.group(3)}" if m2.group(2) \
                    else f"proj_{m2.group(3)}"
                if m2.group(4) == "weight":
                    put(f"score_branch/{mod}/kernel", _dense_kernel(t))
                else:
                    put(f"score_branch/{mod}/bias", _np(t))
                continue
            m2 = re.match(r"score_head\.layers\.(\d)\.(weight|bias)", rest)
            if m2:
                if m2.group(2) == "weight":
                    put(f"score_branch/score_head_{m2.group(1)}/kernel",
                        _dense_kernel(t))
                else:
                    put(f"score_branch/score_head_{m2.group(1)}/bias", _np(t))
            continue

    return flax.traverse_util.unflatten_dict(out)


def _convert_resnet(prefix_t: str, prefix_f: str, name: str, t, put) -> bool:
    """Map one torchvision-style ResNet tensor under `prefix_t` onto the
    mmtrack_tpu ResNet tree (models/resnet.py naming)."""
    if not name.startswith(prefix_t + "."):
        return False
    rest = name[len(prefix_t) + 1:]

    def put_bn(base, leaf):
        nm = {"weight": "scale", "bias": "bias", "running_mean": "mean",
              "running_var": "var"}.get(leaf)
        if nm:
            put(f"{base}/{nm}", _np(t))
        return True

    m = re.match(r"conv1\.weight", rest)
    if m:
        put(f"{prefix_f}/conv1/kernel", _conv_kernel(t))
        return True
    m = re.match(r"bn1\.(.+)", rest)
    if m:
        return put_bn(f"{prefix_f}/bn1", m.group(1))
    m = re.match(r"layer(\d)\.(\d+)\.(.+)", rest)
    if m:
        li, bi, sub = m.groups()
        base = f"{prefix_f}/layer{li}_{bi}"
        m2 = re.match(r"conv(\d)\.weight", sub)
        if m2:
            put(f"{base}/conv{m2.group(1)}/kernel", _conv_kernel(t))
            return True
        m2 = re.match(r"bn(\d)\.(.+)", sub)
        if m2:
            return put_bn(f"{base}/bn{m2.group(1)}", m2.group(2))
        m2 = re.match(r"downsample\.0\.weight", sub)
        if m2:
            put(f"{base}/downsample_conv/kernel", _conv_kernel(t))
            return True
        m2 = re.match(r"downsample\.1\.(.+)", sub)
        if m2:
            return put_bn(f"{base}/downsample_bn", m2.group(1))
    return True  # consumed (fc head etc. are dropped)


def convert_dimp_checkpoint(state_dict: dict) -> dict:
    """torch DiMPnet / DiMPnet_DeT state_dict -> flax params tree.

    Name surface: RGBD/models/DeT/ltr/models/tracking/dimpnet.py (ResNet-50
    backbones, residual_bottleneck clf features, FilterInitializerLinear,
    DiMPSteepestDescentGN, AtomIoUNet). The 1x1 distance-bin predictor convs
    become (bins,) kernels; LinearBlock weights are permuted from the
    torch CHW flatten to the NHWC flatten.
    """
    out: dict[tuple, np.ndarray] = {}

    def put(path, value):
        out[tuple(path.split("/"))] = value

    def put_bn(base, leaf):
        nm = {"weight": "scale", "bias": "bias", "running_mean": "mean",
              "running_var": "var"}.get(leaf)
        return nm and f"{base}/{nm}"

    # LinearBlock pool sizes (atom_iou_net.py:47-48): fc3_rt 5x5, fc4_rt 3x3
    lin_pool = {"fc3_rt": 5, "fc4_rt": 3}

    for name, t in state_dict.items():
        if _convert_resnet("feature_extractor", "backbone", name, t, put) \
                and name.startswith("feature_extractor."):
            continue
        if name.startswith("feature_extractor_depth."):
            _convert_resnet("feature_extractor_depth", "backbone_x", name, t, put)
            continue

        m = re.match(r"merge_layer(\d)\.(weight|bias)", name)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            v = _conv_kernel(t) if m.group(2) == "weight" else _np(t)
            put(f"merge_conv{m.group(1)}/{leaf}", v)
            continue

        m = re.match(r"classifier\.feature_extractor\.0\.weight", name)
        if m:
            put("clf_features/final_conv/kernel", _conv_kernel(t))
            continue
        m = re.match(r"classifier\.filter_initializer\.filter_conv\.(weight|bias)", name)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            v = _conv_kernel(t) if m.group(1) == "weight" else _np(t)
            put(f"filter_initializer/filter_conv/{leaf}", v)
            continue
        m = re.match(r"classifier\.filter_optimizer\.(log_step_length|filter_reg)", name)
        if m:
            put(f"filter_optimizer/{m.group(1)}", _np(t).reshape(1))
            continue
        # super_dimp_hinge: GNSteepestDescent wraps LinearFilterHinge whose
        # only parameter is the filter regularization
        # (keep_track_vot2021/ltr: dimpnet50_hinge, residual_modules.py:93)
        m = re.match(r"classifier\.filter_optimizer\.residual_module\.filter_reg", name)
        if m:
            put("filter_optimizer/filter_reg", _np(t).reshape(1))
            continue
        m = re.match(r"classifier\.filter_optimizer\.label_map_predictor\.weight", name)
        if m:
            put("filter_optimizer/label_map_kernel", _np(t).reshape(-1))
            continue
        m = re.match(r"classifier\.filter_optimizer\.target_mask_predictor\.0\.weight", name)
        if m:
            put("filter_optimizer/target_mask_kernel", _np(t).reshape(-1))
            continue
        m = re.match(r"classifier\.filter_optimizer\.spatial_weight_predictor\.weight", name)
        if m:
            put("filter_optimizer/spatial_weight_kernel", _np(t).reshape(-1))
            continue

        m = re.match(r"bb_regressor\.(\w+)\.(.+)", name)
        if m:
            mod, sub = m.groups()
            base = f"bb_regressor/{mod}"
            if mod == "iou_predictor":
                if sub == "weight":
                    put(f"{base}/kernel", _dense_kernel(t))
                else:
                    put(f"{base}/bias", _np(t))
                continue
            if mod in lin_pool:
                sz = lin_pool[mod]
                if sub == "linear.weight":
                    w = _np(t)  # (out, C*sz*sz) flattened CHW
                    o = w.shape[0]
                    w = w.reshape(o, -1, sz, sz).transpose(0, 2, 3, 1).reshape(o, -1)
                    put(f"{base}/linear/kernel", w.T)
                elif sub == "linear.bias":
                    put(f"{base}/linear/bias", _np(t))
                else:
                    m2 = re.match(r"bn\.(.+)", sub)
                    if m2:
                        p = put_bn(f"{base}/bn", m2.group(1))
                        if p:
                            put(p, _np(t))
                continue
            # ConvBlock: .0 conv (with bias), .1 BN
            if sub == "0.weight":
                put(f"{base}/conv/kernel", _conv_kernel(t))
            elif sub == "0.bias":
                put(f"{base}/conv/bias", _np(t))
            elif sub.startswith("1."):
                p = put_bn(f"{base}/bn", sub[2:])
                if p:
                    put(p, _np(t))
            continue

    return flax.traverse_util.unflatten_dict(out)


def convert_atom_checkpoint(state_dict: dict) -> dict:
    """ATOMnet (RGBD/models/DeT/ltr/models/bbreg/atom.py:177-189:
    resnet18 feature_extractor + AtomIoUNet bb_regressor, no learned
    classifier) -> flax params for models/atom.ATOMNet. The name surface
    is a subset of DiMPnet's; the shared converter maps it."""
    return convert_dimp_checkpoint(state_dict)


def convert_prdimp_checkpoint(state_dict: dict) -> dict:
    """PrDiMP-50 (klcedimpnet50, keep_track_vot2021/ltr/models/tracking/
    dimpnet.py:411-460) -> flax params for build_prdimp50. The name
    surface equals dimpnet50 except the optimizer, whose only parameters
    are log_step_length and filter_reg (PrDiMPSteepestDescentNewton) —
    the same names convert_dimp_checkpoint already maps; this is the
    by-name entry point for prdimp checkpoints."""
    return convert_dimp_checkpoint(state_dict)


def convert_super_dimp_checkpoint(state_dict: dict) -> dict:
    """super_dimp_hinge (the KeepTrack base network,
    keep_track/release.py:66) -> flax params for build_super_dimp50.

    The name surface is dimpnet50_hinge (keep_track_vot2021/ltr/models/
    tracking/dimpnet.py:216-268) — identical to dimpnet50 except the
    filter optimizer, a GNSteepestDescent whose only parameter is
    `residual_module.filter_reg`; convert_dimp_checkpoint already maps
    both layouts, so this is the by-name entry point for super_dimp
    checkpoints."""
    return convert_dimp_checkpoint(state_dict)


def convert_kys_checkpoint(state_dict: dict) -> dict:
    """torch KYSNet (kysnet_res50, keep_track_vot2021/ltr/models/tracking/
    kysnet.py:123-184; public upstream kys.pth naming) -> flax params for
    models/kys.build_kysnet.

    The DiMP base re-uses convert_dimp_checkpoint under a prefix rename
    (backbone_feature_extractor -> feature_extractor, dimp_classifier ->
    classifier) and lands in the `dimp` subtree. The response predictor
    (predictor.predictor.*, a PredictorWrapper around ResponsePredictor —
    resp_predictor.py:412-563) maps its nested conv_block Sequentials
    (.N.0 conv / .N.1 BN) onto the flax list-submodule names
    (`cost_volume_proc1_0/conv`, ...)."""
    base_sd: dict = {}
    pred_sd: dict = {}
    for name, t in state_dict.items():
        if name.startswith("backbone_feature_extractor."):
            base_sd["feature_extractor." + name.split(".", 1)[1]] = t
        elif name.startswith("dimp_classifier."):
            base_sd["classifier." + name.split(".", 1)[1]] = t
        elif name.startswith("bb_regressor."):
            base_sd[name] = t
        elif name.startswith("predictor.predictor."):
            pred_sd[name[len("predictor.predictor."):]] = t
        # predictor.cost_volume (the correlation layer) has no parameters

    out: dict[tuple, np.ndarray] = {}

    def put(path, value):
        out[tuple(("predictor/" + path).split("/"))] = value

    def put_bn(base, leaf, t):
        nm = {"weight": "scale", "bias": "bias", "running_mean": "mean",
              "running_var": "var"}.get(leaf)
        if nm:
            put(f"{base}/bn/{nm}", _np(t))

    seqs = ("cost_volume_proc1", "cost_volume_proc2",
            "representation_predictor", "is_target_predictor")
    for name, t in pred_sd.items():
        m = re.match(r"(\w+)\.(\d)\.(\d)\.(.+)", name)
        if m and m.group(1) in seqs:
            mod, blk, layer, leaf = m.groups()
            base = f"{mod}_{blk}"
            if layer == "0":  # conv
                if leaf == "weight":
                    put(f"{base}/conv/kernel", _conv_kernel(t))
                else:
                    put(f"{base}/conv/bias", _np(t))
            else:  # BN
                put_bn(base, leaf, t)
            continue
        m = re.match(r"(response_predictor|init_hidden_state_predictor)"
                     r"\.0\.(\d)\.(.+)", name)
        if m:
            mod, layer, leaf = m.groups()
            if layer == "0":
                if leaf == "weight":
                    put(f"{mod}/conv/kernel", _conv_kernel(t))
                else:
                    put(f"{mod}/conv/bias", _np(t))
            else:
                put_bn(mod, leaf, t)
            continue
        m = re.match(r"state_predictor\.(conv_reset|conv_update|"
                     r"conv_state_new)\.(weight|bias)", name)
        if m:
            mod, leaf = m.groups()
            if leaf == "weight":
                put(f"state_predictor/{mod}/kernel", _conv_kernel(t))
            else:
                put(f"state_predictor/{mod}/bias", _np(t))
            continue
        # patch_going_oof_w / patch_coming_in_w belong to the
        # model_out_of_frame variant (SepProcConvGRUv6), not the canonical
        # ResponsePredictor — skip silently if present.

    tree = flax.traverse_util.unflatten_dict(out)
    tree["dimp"] = convert_dimp_checkpoint(base_sd)
    return tree


def convert_lwl_checkpoint(state_dict: dict) -> dict:
    """torch LWTLNet (steepest_descent_resnet50, keep_track_vot2021/ltr/
    models/lwl/lwl_net.py:147-209) -> flax params for models/lwl.LWLNet.

    Maps: the ResNet-50 backbone (shared resnet converter), the target
    model's feature Sequential (final 3x3 conv; InstanceL2Norm is
    parameterless), GNSteepestDescent's residual filter_reg, the
    ResidualDS16SW label encoder (its BasicBlocks carry a plain biased 3x3
    downsample conv — label_encoder.py:16-20), and the TSE/RRB/CAB/proj/
    Upsampler decoder ModuleDicts."""
    out: dict[tuple, np.ndarray] = {}

    def put(path, value):
        out[tuple(path.split("/"))] = value

    def put_bn(base, leaf, t):
        nm = {"weight": "scale", "bias": "bias", "running_mean": "mean",
              "running_var": "var"}.get(leaf)
        if nm:
            put(f"{base}/{nm}", _np(t))

    def put_conv(base, leaf, t):
        if leaf == "weight":
            put(f"{base}/kernel", _conv_kernel(t))
        else:
            put(f"{base}/bias", _np(t))

    for name, t in state_dict.items():
        if name.startswith("feature_extractor."):
            _convert_resnet("feature_extractor", "feature_extractor",
                            name, t, put)
            continue
        m = re.match(r"target_model\.feature_extractor\.(\d)\.weight", name)
        if m:
            put("tm_features/final_conv/kernel", _conv_kernel(t))
            continue
        if re.match(r"target_model\.filter_optimizer\."
                    r"(residual_module\.)?filter_reg", name):
            put("filter_reg", _np(t).reshape(1))
            continue
        m = re.match(r"label_encoder\.(.+)", name)
        if m:
            sub = m.group(1)
            m2 = re.match(r"conv_block\.(\d)\.(.+)", sub)
            if m2:
                if m2.group(1) == "0":
                    put_conv("label_encoder/conv_block/conv", m2.group(2), t)
                else:
                    put_bn("label_encoder/conv_block/bn", m2.group(2), t)
                continue
            m2 = re.match(r"(res1|res2)\.(conv1|conv2|downsample)\.(.+)", sub)
            if m2:
                put_conv(f"label_encoder/{m2.group(1)}/{m2.group(2)}",
                         m2.group(3), t)
                continue
            m2 = re.match(r"(res1|res2)\.(bn1|bn2)\.(.+)", sub)
            if m2:
                put_bn(f"label_encoder/{m2.group(1)}/{m2.group(2)}",
                       m2.group(3), t)
                continue
            m2 = re.match(r"label_pred\.(\d)\.(.+)", sub)
            if m2:
                if m2.group(1) == "0":
                    put_conv("label_encoder/label_pred/conv", m2.group(2), t)
                else:
                    put_bn("label_encoder/label_pred/bn", m2.group(2), t)
                continue
            m2 = re.match(r"samp_w_pred\.(.+)", sub)
            if m2:
                put_conv("label_encoder/samp_w_pred", m2.group(1), t)
                continue
        m = re.match(r"decoder\.(.+)", name)
        if m:
            sub = m.group(1)
            m2 = re.match(r"TSE\.(\w+)\.reduce\.(\d)\.(.+)", sub)
            if m2:
                put_conv(f"decoder/TSE_{m2.group(1)}/reduce_{m2.group(2)}",
                         m2.group(3), t)
                continue
            m2 = re.match(r"TSE\.(\w+)\.transform\.(\d)\.(.+)", sub)
            if m2:
                put_conv(f"decoder/TSE_{m2.group(1)}/transform_{m2.group(2)}",
                         m2.group(3), t)
                continue
            m2 = re.match(r"(RRB1|RRB2)\.(\w+)\.conv1x1\.(.+)", sub)
            if m2:
                put_conv(f"decoder/{m2.group(1)}_{m2.group(2)}/conv1x1",
                         m2.group(3), t)
                continue
            m2 = re.match(r"(RRB1|RRB2)\.(\w+)\.bblock\.(\d)\.(.+)", sub)
            if m2:
                base = f"decoder/{m2.group(1)}_{m2.group(2)}"
                idx, leaf = m2.group(3), m2.group(4)
                if idx == "1":  # the BN inside bblock (use_bn=True layout)
                    put_bn(f"{base}/bblock_bn", leaf, t)
                else:           # 0 and 3 -> convs; flax names 0 and 2
                    fidx = "0" if idx == "0" else "2"
                    put_conv(f"{base}/bblock_{fidx}", leaf, t)
                continue
            m2 = re.match(r"CAB\.(\w+)\.convreluconv\.(\d)\.(.+)", sub)
            if m2:
                put_conv(f"decoder/CAB_{m2.group(1)}/convreluconv_{m2.group(2)}",
                         m2.group(3), t)
                continue
            m2 = re.match(r"proj\.(\w+)\.0\.(.+)", sub)
            if m2:
                put_conv(f"decoder/proj_{m2.group(1)}", m2.group(2), t)
                continue
            m2 = re.match(r"project\.(conv1|conv2)\.(.+)", sub)
            if m2:
                put_conv(f"decoder/project_{m2.group(1)}", m2.group(2), t)
                continue

    return flax.traverse_util.unflatten_dict(out)


def convert_stm_checkpoint(state_dict: dict) -> dict:
    """torch STM (keep_track_vot2021/pytracking/tracker/stm/model.py, the
    fork's vendored Oh et al. net; public STM.pth naming, DataParallel
    'module.' prefix tolerated) -> flax params for models/stm.build_stm.

    The encoders are torchvision ResNet-50 trunks with renamed stages
    (res2/res3/res4 = layer1/layer2/layer3) — rename and reuse the shared
    resnet converter; layer4/fc are unused by STM and stay at their
    initialized values (expected `missing` on load)."""
    out: dict[tuple, np.ndarray] = {}

    def put(path, value):
        out[tuple(path.split("/"))] = value

    stage = {"res2": "layer1", "res3": "layer2", "res4": "layer3"}
    for name, t in state_dict.items():
        if name.startswith("module."):
            name = name[len("module."):]
        m = re.match(r"(Encoder_M|Encoder_Q)\.(.+)", name)
        if m:
            enc = "encoder_m" if m.group(1) == "Encoder_M" else "encoder_q"
            sub = m.group(2)
            if sub in ("mean", "std"):
                continue
            m2 = re.match(r"conv1_(m|o)\.weight", sub)
            if m2:
                put(f"conv1_{m2.group(1)}/kernel", _conv_kernel(t))
                continue
            m2 = re.match(r"(res\d)\.(.+)", sub)
            if m2:
                sub = f"{stage[m2.group(1)]}.{m2.group(2)}"
            _convert_resnet("enc", enc, f"enc.{sub}", t, put)
            continue
        m = re.match(r"KV_(M|Q)_r4\.(Key|Value)\.(weight|bias)", name)
        if m:
            base = f"KV_{m.group(1)}_{m.group(2)}"
            if m.group(3) == "weight":
                put(f"{base}/kernel", _conv_kernel(t))
            else:
                put(f"{base}/bias", _np(t))
            continue
        m = re.match(r"Decoder\.(.+)", name)
        if m:
            sub = m.group(1)
            sub = sub.replace("convFM", "dec_convFM") \
                     .replace("ResMM", "ResMM") \
                     .replace("pred2", "dec_pred2")
            # map module paths onto the flax names
            sub = re.sub(r"^ResMM\.", "dec_ResMM/", sub)
            sub = re.sub(r"^RF(\d)\.", r"dec_RF\1/", sub)
            sub = sub.replace(".", "/")
            leaf = "kernel" if sub.endswith("/weight") else "bias"
            base = sub.rsplit("/", 1)[0]
            v = _conv_kernel(t) if leaf == "kernel" else _np(t)
            put(f"{base}/{leaf}", v)
            continue

    return flax.traverse_util.unflatten_dict(out)


def convert_eco_backbone_checkpoint(state_dict: dict) -> dict:
    """resnet18_vggmconv1.pth (ECO's feature net: keep_track_vot2021/ltr/
    models/backbone/resnet_vggm.py, loaded raw by resnet18_vggmconv1 and
    wrapped by pytracking/features/deep.py ResNetVGGm1) -> flax params for
    models/backbones.ResNetVGGm1. The VGG-M conv1 branch carries a bias;
    its LRN has no parameters; the trunk is torchvision-style ResNet-18."""
    out: dict[tuple, np.ndarray] = {}

    def put(path, value):
        out[tuple(path.split("/"))] = value

    for name, t in state_dict.items():
        if name == "vggmconv1.weight":
            put("params/vggmconv1/kernel", _conv_kernel(t))
        elif name == "vggmconv1.bias":
            put("params/vggmconv1/bias", _np(t))
        else:
            _convert_resnet("net", "params", f"net.{name}", t, put)
    return flax.traverse_util.unflatten_dict(out)


def _put_mha(put, base_t: str, base_f: str, name: str, t) -> bool:
    """torch nn.MultiheadAttention -> q/k/v/proj Dense leaves."""
    m = re.match(rf"{re.escape(base_t)}\.in_proj_(weight|bias)$", name)
    if m:
        v = _np(t)
        d = v.shape[0] // 3
        for i, part in enumerate(("q", "k", "v")):
            chunk = v[i * d:(i + 1) * d]
            if m.group(1) == "weight":
                put(f"{base_f}/{part}/kernel", chunk.T)
            else:
                put(f"{base_f}/{part}/bias", chunk)
        return True
    m = re.match(rf"{re.escape(base_t)}\.out_proj\.(weight|bias)$", name)
    if m:
        if m.group(1) == "weight":
            put(f"{base_f}/proj/kernel", _dense_kernel(t))
        else:
            put(f"{base_f}/proj/bias", _np(t))
        return True
    return False


def convert_stark_checkpoint(state_dict: dict) -> dict:
    """torch STARKS/STARKST (SPT) state_dict -> flax params tree.

    Name surface: RGBD/models/SPT/lib/models/stark/{stark_s,stark_st,
    transformer}.py — dual DETR backbones (Joiner index 0 + body), color/
    depth/fusion encoders, decoder with final norm, Conv1d neck, corner
    head, ST2 MLP cls head. The unused positional-embedding Joiner slot has
    no parameters (sine).
    """
    out: dict[tuple, np.ndarray] = {}

    def put(path, value):
        out[tuple(path.split("/"))] = value

    def put_ln(base, leaf, t):
        put(f"{base}/{'scale' if leaf == 'weight' else 'bias'}", _np(t))

    def put_bn(base, leaf, t):
        nm = {"weight": "scale", "bias": "bias", "running_mean": "mean",
              "running_var": "var"}.get(leaf)
        if nm:
            put(f"{base}/{nm}", _np(t))

    enc_map = {"transformer.encoder_color.layers": "enc",
               "transformer.encoder_depth.layers": "enc_d",
               "transformer.fusion.layers": "fus",
               "transformer.encoder.layers": "enc"}   # single-backbone stark

    for name, t in state_dict.items():
        if name.startswith("backbone_color.0.body.") or \
                name.startswith("backbone.0.body."):
            pref = name.split(".body.")[0] + ".body"
            _convert_resnet(pref, "backbone", name, t, put)
            continue
        if name.startswith("backbone_depth.0.body."):
            _convert_resnet("backbone_depth.0.body", "backbone_x", name, t, put)
            continue
        m = re.match(r"bottleneck(_color)?\.(weight|bias)", name)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            v = _conv_kernel(t) if m.group(2) == "weight" else _np(t)
            put(f"bottleneck/{leaf}", v)
            continue
        m = re.match(r"bottleneck_depth\.(weight|bias)", name)
        if m:
            leaf = "kernel" if m.group(1) == "weight" else "bias"
            v = _conv_kernel(t) if m.group(1) == "weight" else _np(t)
            put(f"bottleneck_x/{leaf}", v)
            continue
        if name == "query_embed.weight":
            put("query_embed", _np(t))
            continue
        m = re.match(r"transformer\.neck\.(weight|bias)", name)
        if m:
            if m.group(1) == "weight":
                put("neck/kernel", _np(t)[:, :, 0].T)  # Conv1d (O,I,1)
            else:
                put("neck/bias", _np(t))
            continue
        m = re.match(r"transformer\.decoder\.norm\.(weight|bias)", name)
        if m:
            put_ln("dec_norm", m.group(1), t)
            continue

        handled = False
        for tpref, fpref in enc_map.items():
            m = re.match(rf"{re.escape(tpref)}\.(\d+)\.(.+)", name)
            if not m:
                continue
            i, sub = m.groups()
            base = f"{fpref}_{i}"
            if _put_mha(put, "self_attn", f"{base}/self_attn", sub, t):
                handled = True
                break
            m2 = re.match(r"linear([12])\.(weight|bias)", sub)
            if m2:
                leaf = "kernel" if m2.group(2) == "weight" else "bias"
                v = _dense_kernel(t) if m2.group(2) == "weight" else _np(t)
                put(f"{base}/linear{m2.group(1)}/{leaf}", v)
                handled = True
                break
            m2 = re.match(r"norm([12])\.(weight|bias)", sub)
            if m2:
                put_ln(f"{base}/norm{m2.group(1)}", m2.group(2), t)
                handled = True
                break
            handled = True
            break
        if handled:
            continue

        m = re.match(r"transformer\.decoder\.layers\.(\d+)\.(.+)", name)
        if m:
            i, sub = m.groups()
            base = f"dec_{i}"
            if _put_mha(put, "self_attn", f"{base}/self_attn", sub, t):
                continue
            if _put_mha(put, "multihead_attn", f"{base}/cross_attn", sub, t):
                continue
            m2 = re.match(r"linear([12])\.(weight|bias)", sub)
            if m2:
                leaf = "kernel" if m2.group(2) == "weight" else "bias"
                v = _dense_kernel(t) if m2.group(2) == "weight" else _np(t)
                put(f"{base}/linear{m2.group(1)}/{leaf}", v)
                continue
            m2 = re.match(r"norm([123])\.(weight|bias)", sub)
            if m2:
                put_ln(f"{base}/norm{m2.group(1)}", m2.group(2), t)
            continue

        m = re.match(r"box_head\.conv(\d)_(tl|br)\.(.+)", name)
        if m:
            k, branch, sub = m.groups()
            base = f"box_head/{branch}/conv{k}"
            if k == "5":
                if sub == "weight":
                    put(f"{base}/kernel", _conv_kernel(t))
                elif sub == "bias":
                    put(f"{base}/bias", _np(t))
            elif sub == "0.weight":
                put(f"{base}/conv/kernel", _conv_kernel(t))
            elif sub == "0.bias":
                put(f"{base}/conv/bias", _np(t))
            elif sub.startswith("1."):
                put_bn(f"{base}/bn", sub[2:], t)
            continue

        m = re.match(r"cls_head\.layers\.(\d)\.(weight|bias)", name)
        if m:
            if m.group(2) == "weight":
                put(f"cls_{m.group(1)}/kernel", _dense_kernel(t))
            else:
                put(f"cls_{m.group(1)}/bias", _np(t))
            continue

    return flax.traverse_util.unflatten_dict(out)


def convert_score_head_checkpoint(state_dict: dict, prefix: str = "cls_head.") -> dict:
    """OSTrack-online ScoreTransformer weights -> flax tree for
    models/vipt.ScoreTransformer (RGBD/models/OSTrack/lib/models/ostrack/
    score_head.py + layers/cross_attn.py naming). Pass the full OSTrack
    state_dict; only `prefix`-rooted tensors are consumed (combine with
    convert_vipt_checkpoint for the backbone/box head)."""
    out: dict[tuple, np.ndarray] = {}

    def put(path, value):
        out[tuple(path.split("/"))] = value

    for name, t in state_dict.items():
        if not name.startswith(prefix):
            continue
        rest = name[len(prefix):]
        m = re.match(r"cls_proj\.(weight|bias)", rest)
        if m:
            v = _dense_kernel(t) if m.group(1) == "weight" else _np(t)
            put(f"cls_proj/{'kernel' if m.group(1) == 'weight' else 'bias'}", v)
            continue
        m = re.match(r"norm\.(weight|bias)", rest)
        if m:
            put(f"norm/{'scale' if m.group(1) == 'weight' else 'bias'}", _np(t))
            continue
        m = re.match(r"score_head\.layers\.(\d+)\.(weight|bias)", rest)
        if m:
            if m.group(2) == "weight":
                put(f"score_head_{m.group(1)}/kernel", _dense_kernel(t))
            else:
                put(f"score_head_{m.group(1)}/bias", _np(t))
            continue
        m = re.match(r"blocks\.(\d+)\.(.+)", rest)
        if m:
            i, sub = m.groups()
            base = f"blocks_{i}"
            for ln in ("norm1", "norm2"):
                m2 = re.match(rf"{ln}\.(weight|bias)", sub)
                if m2:
                    put(f"{base}/{ln}/"
                        f"{'scale' if m2.group(1) == 'weight' else 'bias'}",
                        _np(t))
            m2 = re.match(r"attn\.(qkv|proj)\.(weight|bias)", sub)
            if m2:
                if m2.group(2) == "weight":
                    put(f"{base}/{m2.group(1)}/kernel", _dense_kernel(t))
                else:
                    put(f"{base}/{m2.group(1)}/bias", _np(t))
            m2 = re.match(r"mlp\.(fc[12])\.(weight|bias)", sub)
            if m2:
                if m2.group(2) == "weight":
                    put(f"{base}/{m2.group(1)}/kernel", _dense_kernel(t))
                else:
                    put(f"{base}/{m2.group(1)}/bias", _np(t))

    return flax.traverse_util.unflatten_dict(out)


def convert_mdnet_checkpoint(state_dict: dict) -> dict:
    """torch pyMDNet/pyVITAL state_dict -> flax params tree.

    Name surface: RGBE/models/pyMDNet/modules/model.py:44-66 (conv1-3
    Sequential trunk, fc4/fc5 linears, fc6 domain branches). The fc4 weight
    is permuted from the torch CHW conv flatten to the NHWC flatten.
    """
    out: dict[tuple, np.ndarray] = {}

    def put(path, value):
        out[tuple(path.split("/"))] = value

    for name, t in state_dict.items():
        m = re.match(r"layers\.conv(\d)\.0\.(weight|bias)", name)
        if m:
            if m.group(2) == "weight":
                put(f"features/conv{m.group(1)}/kernel", _conv_kernel(t))
            else:
                put(f"features/conv{m.group(1)}/bias", _np(t))
            continue
        m = re.match(r"layers\.fc4\.0\.(weight|bias)", name)
        if m:
            if m.group(1) == "weight":
                w = _np(t)  # (512, 512*3*3) CHW flatten
                w = w.reshape(w.shape[0], 512, 3, 3).transpose(0, 2, 3, 1)
                put("fc4/kernel", w.reshape(w.shape[0], -1).T)
            else:
                put("fc4/bias", _np(t))
            continue
        m = re.match(r"layers\.fc5\.1\.(weight|bias)", name)
        if m:
            if m.group(1) == "weight":
                put("fc5/kernel", _dense_kernel(t))
            else:
                put("fc5/bias", _np(t))
            continue
        m = re.match(r"branches\.(\d+)\.1\.(weight|bias)", name)
        if m:
            if m.group(2) == "weight":
                put(f"fc6_{m.group(1)}/kernel", _dense_kernel(t))
            else:
                put(f"fc6_{m.group(1)}/bias", _np(t))
            continue

    return flax.traverse_util.unflatten_dict(out)


def convert_manet_checkpoint(state_dict: dict) -> dict:
    """torch MANet state_dict -> flax params for MDNet(mode='adapter').

    Name surface: RGBE/models/MANet/modules/MANet3x1x1_IC.py:58-152 —
    shared `layers` VGG-M trunk (custom centered LRN) applied to both
    modalities, per-modality adapter branches {RGB,T}_para{1..3}
    (Conv+ReLU+BN+Dropout(+MaxPool5/2)) summed into each stage, conv3
    streams channel-concatenated (R first, forward :245) before fc4. The
    fc4 weight is permuted from the torch CHW flatten to NHWC.
    """
    out: dict[tuple, np.ndarray] = {}

    def put(path, value):
        out[tuple(path.split("/"))] = value

    bn_leaf = {"weight": "scale", "bias": "bias",
               "running_mean": "mean", "running_var": "var"}

    for name, t in state_dict.items():
        m = re.match(r"(RGB|T)_para(\d)_\dx\d\.[RT]conv\d\.(\d)\.(\w+)",
                     name)
        if m:
            stream = "rgb" if m.group(1) == "RGB" else "x"
            s, idx, kind = m.group(2), int(m.group(3)), m.group(4)
            base = f"adapt{s}_{stream}"
            if idx == 0:  # conv
                leaf = _conv_kernel(t) if kind == "weight" else _np(t)
                put(f"{base}/conv/"
                    f"{'kernel' if kind == 'weight' else 'bias'}", leaf)
            elif idx == 2 and kind in bn_leaf:  # BatchNorm2d
                put(f"{base}/bn/{bn_leaf[kind]}", _np(t))
            continue
        m = re.match(r"layers\.conv(\d)\.0\.(weight|bias)", name)
        if m:
            leaf = _conv_kernel(t) if m.group(2) == "weight" else _np(t)
            put(f"features/conv{m.group(1)}/"
                f"{'kernel' if m.group(2) == 'weight' else 'bias'}", leaf)
            continue
        m = re.match(r"layers\.fc4\.1\.(weight|bias)", name)
        if m:
            if m.group(1) == "weight":
                w = _np(t)  # (512, 1024*3*3) CHW flatten of the concat
                w = w.reshape(w.shape[0], 1024, 3, 3).transpose(0, 2, 3, 1)
                put("fc4/kernel", w.reshape(w.shape[0], -1).T)
            else:
                put("fc4/bias", _np(t))
            continue
        m = re.match(r"layers\.fc5\.1\.(weight|bias)", name)
        if m:
            if m.group(1) == "weight":
                put("fc5/kernel", _dense_kernel(t))
            else:
                put("fc5/bias", _np(t))
            continue
        m = re.match(r"branches\.(\d+)\.1\.(weight|bias)", name)
        if m:
            if m.group(2) == "weight":
                put(f"fc6_{m.group(1)}/kernel", _dense_kernel(t))
            else:
                put(f"fc6_{m.group(1)}/bias", _np(t))
            continue

    return flax.traverse_util.unflatten_dict(out)


def convert_apfnet_checkpoint(state_dict: dict) -> dict:
    """torch APFNet tracking state_dict -> flax params tree.

    Name surface: RGBT/models/APFNet/modules/model_tracking.py:50-240 —
    dual layers_v/layers_i trunks, parallel{1..3} attribute-branch
    ModuleLists (index order FM, OCC, SC, TC, ILL), parallel{s}_skconv /
    ensemble{s}_skconv selective-kernel gates, transformer{s}_encoder{1..3}
    / decoder{1..2} channel-attention blocks (WK/WV linears + fc_reduce /
    fc_rise 1x1 convs), fc4/fc5 trunk and fc6 domain branches. The fc4
    weight is permuted from the torch CHW conv flatten to the NHWC flatten
    (cat((x1,x2),1).view(B,-1), forward :1159-1160).
    """
    from mmtrack_tpu.models.apfnet import ATTRIBUTES

    out: dict[tuple, np.ndarray] = {}

    def put(path, value):
        out[tuple(path.split("/"))] = value

    roles = {"encoder1": "enc_vis", "encoder2": "enc_inf",
             "encoder3": "enc_agg", "decoder1": "dec_vis",
             "decoder2": "dec_inf"}

    for name, t in state_dict.items():
        m = re.match(r"layers_([vi])\.conv(\d)\.0\.(weight|bias)", name)
        if m:
            stream, i, kind = m.groups()
            leaf = _conv_kernel(t) if kind == "weight" else _np(t)
            put(f"layers_{stream}/conv{i}/"
                f"{'kernel' if kind == 'weight' else 'bias'}", leaf)
            continue
        m = re.match(r"parallel(\d)\.(\d)\.parallel\d_conv(\d)\.0"
                     r"\.(weight|bias)", name)
        if m:
            s, a, ci, kind = m.groups()
            leaf = _conv_kernel(t) if kind == "weight" else _np(t)
            put(f"attr{int(s) - 1}_{ATTRIBUTES[int(a)]}/conv{ci}/"
                f"{'kernel' if kind == 'weight' else 'bias'}", leaf)
            continue
        m = re.match(r"parallel(\d)_skconv\.(\d)\.parallel\d_skconv_fc(\d)"
                     r"\.0\.weight", name)
        if m:
            s, a, fi = m.groups()
            put(f"attr{int(s) - 1}_{ATTRIBUTES[int(a)]}/sk_fc{fi}/kernel",
                _conv_kernel(t))
            continue
        m = re.match(r"ensemble(\d)_skconv\.ensemble\d_skconv_fc(\d)"
                     r"\.0\.weight", name)
        if m:
            s, fi = m.groups()
            put(f"agg{int(s) - 1}/sk_fc{fi}/kernel", _conv_kernel(t))
            continue
        m = re.match(r"transformer(\d)_(encoder\d|decoder\d)\.transformer"
                     r"\d_\w+?_(WK|WV|fc_reduce|fc_rise)\.0\.(weight|bias)",
                     name)
        if m:
            s, role, part, kind = m.groups()
            base = f"agg{int(s) - 1}/{roles[role]}"
            if part in ("WK", "WV"):
                leaf = _dense_kernel(t) if kind == "weight" else _np(t)
                put(f"{base}/{part}/"
                    f"{'kernel' if kind == 'weight' else 'bias'}", leaf)
            else:
                sub = "reduce" if part == "fc_reduce" else "rise"
                leaf = _conv_kernel(t) if kind == "weight" else _np(t)
                put(f"{base}/{sub}/"
                    f"{'kernel' if kind == 'weight' else 'bias'}", leaf)
            continue
        m = re.match(r"fc\.fc4\.0\.(weight|bias)", name)
        if m:
            if m.group(1) == "weight":
                w = _np(t)  # (512, 1024*3*3) CHW flatten of the concat
                w = w.reshape(w.shape[0], 1024, 3, 3).transpose(0, 2, 3, 1)
                put("fc4/kernel", w.reshape(w.shape[0], -1).T)
            else:
                put("fc4/bias", _np(t))
            continue
        m = re.match(r"fc\.fc5\.1\.(weight|bias)", name)
        if m:
            if m.group(1) == "weight":
                put("fc5/kernel", _dense_kernel(t))
            else:
                put("fc5/bias", _np(t))
            continue
        m = re.match(r"branches\.(\d+)\.1\.(weight|bias)", name)
        if m:
            if m.group(2) == "weight":
                put(f"fc6_{m.group(1)}/kernel", _dense_kernel(t))
            else:
                put(f"fc6_{m.group(1)}/bias", _np(t))
            continue

    return flax.traverse_util.unflatten_dict(out)


def convert_peak_matching_checkpoint(state_dict: dict) -> dict:
    """torch PeakMatchingNetwork (keep_track_vot2021/ltr/models/
    memory_learning/peak_matching.py:476-544: DescriptorExtractor conv +
    SuperGlue matcher) -> the matcher_params dict consumed by
    trackers.keeptrack_tracker.KeepTrackTracker:

        {"desc":    {"params": ...},
         "matcher": {"params": ..., "batch_stats": ...}}

    The ResNet `feature_extractor.*` entries are skipped — at runtime the
    tracker feeds the MAIN network's backbone features through
    get_backbone_clf_feat (keep_track.py:1181), so the matcher net's own
    backbone is dead weight.

    Layout notes:
      - torch MultiHeadedAttention splits channels d-major
        (`view(b, head_dim, h, n)`, peak_matching.py:156) while the flax
        MultiHeadedAttention reshapes head-major; the q/k/v output channels
        and the merge input channels are permuted accordingly.
      - torch MLP() = Conv1d(k=1) + BatchNorm1d; kernels become Dense
        kernels, running stats land in batch_stats.
    """
    D, H = 256, 4
    hd = D // H
    # flax head-major channel c' = h*hd + d  <-  torch d-major c = d*H + h
    perm = np.asarray([(c % hd) * H + c // hd for c in range(D)])

    desc: dict[tuple, np.ndarray] = {}
    mpar: dict[tuple, np.ndarray] = {}
    mstat: dict[tuple, np.ndarray] = {}

    def put(out, path, value):
        out[tuple(path.split("/"))] = value

    def put_mlp(base_t: str, base_f: str, idx_t: str, name: str, t):
        """torch Sequential index -> flax MLPBlock lin{i}/bn{i}."""
        i = int(idx_t)
        if i % 3 == 0:  # Conv1d at 0, 3, 6, ...
            j = i // 3
            if name == "weight":
                put(mpar, f"{base_f}/lin{j}/kernel", _conv1x1_1d_to_dense(t))
            else:
                put(mpar, f"{base_f}/lin{j}/bias", _np(t))
        else:           # BatchNorm1d at 1, 4, 7, ...
            j = i // 3
            if name == "weight":
                put(mpar, f"{base_f}/bn{j}/scale", _np(t))
            elif name == "bias":
                put(mpar, f"{base_f}/bn{j}/bias", _np(t))
            elif name == "running_mean":
                put(mstat, f"{base_f}/bn{j}/mean", _np(t))
            elif name == "running_var":
                put(mstat, f"{base_f}/bn{j}/var", _np(t))

    for name, t in state_dict.items():
        if name.startswith("feature_extractor.") or "num_batches_tracked" in name:
            continue

        if name == "descriptor_extractor.conv.weight":
            put(desc, "conv/kernel", _conv_kernel(t))
            continue
        if name == "descriptor_extractor.conv.bias":
            put(desc, "conv/bias", _np(t))
            continue

        if not name.startswith("matcher."):
            continue
        rest = name[len("matcher."):]

        if rest == "bin_score":
            put(mpar, "bin_score", _np(t))
            continue
        if rest.startswith("final_proj."):
            if rest.endswith("weight"):
                put(mpar, "final_proj/kernel", _conv1x1_1d_to_dense(t))
            else:
                put(mpar, "final_proj/bias", _np(t))
            continue

        m = re.match(r"kenc\.encoder\.(\d+)\.(\w+)", rest)
        if m:
            put_mlp("kenc.encoder", "kenc/encoder", m.group(1), m.group(2), t)
            continue

        m = re.match(r"gnn\.layers\.(\d+)\.update\.attn\.proj\.([012])\.(weight|bias)",
                     rest)
        if m:
            li, pi, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
            proj_name = ("proj_q", "proj_k", "proj_v")[pi]
            base = f"gnn/layer{li}/attn/{proj_name}"
            if leaf == "weight":
                w = _np(t)[:, :, 0]           # (O, I)
                put(mpar, f"{base}/kernel", w[perm, :].T)   # out reordered
            else:
                put(mpar, f"{base}/bias", _np(t)[perm])
            continue

        m = re.match(r"gnn\.layers\.(\d+)\.update\.attn\.merge\.(weight|bias)",
                     rest)
        if m:
            li, leaf = int(m.group(1)), m.group(2)
            base = f"gnn/layer{li}/attn/merge"
            if leaf == "weight":
                w = _np(t)[:, :, 0]           # (O, I)
                put(mpar, f"{base}/kernel", w[:, perm].T)   # in reordered
            else:
                put(mpar, f"{base}/bias", _np(t))
            continue

        m = re.match(r"gnn\.layers\.(\d+)\.update\.mlp\.(\d+)\.(\w+)", rest)
        if m:
            put_mlp("mlp", f"gnn/layer{int(m.group(1))}/mlp",
                    m.group(2), m.group(3), t)
            continue

    return {
        "desc": {"params": flax.traverse_util.unflatten_dict(desc)},
        "matcher": {
            "params": flax.traverse_util.unflatten_dict(mpar),
            "batch_stats": flax.traverse_util.unflatten_dict(mstat),
        },
    }


def _conv1x1_1d_to_dense(w):
    return _np(w)[:, :, 0].T  # Conv1d (O, I, 1) -> Dense (I, O)


def load_into(flax_params: dict, converted: dict, strict: bool = False) -> tuple[dict, list, list]:
    """Overlay converted leaves onto an initialized flax tree.

    Returns (params, missing_keys, unexpected_keys) — the reference prints
    the same diagnostics on non-strict load (vit_ce_prompt.py:364-368).
    """
    flat_p = flax.traverse_util.flatten_dict(flax.core.unfreeze(flax_params))
    flat_c = flax.traverse_util.flatten_dict(converted)
    missing = [k for k in flat_p if k not in flat_c]
    unexpected = [k for k in flat_c if k not in flat_p]
    if strict and (missing or unexpected):
        raise KeyError(f"missing={missing[:5]}... unexpected={unexpected[:5]}...")
    for k, v in flat_c.items():
        if k in flat_p:
            if flat_p[k].shape != v.shape:
                raise ValueError(f"shape mismatch at {k}: "
                                 f"{flat_p[k].shape} vs {v.shape}")
            flat_p[k] = v.astype(flat_p[k].dtype)
    return flax.traverse_util.unflatten_dict(flat_p), missing, unexpected
