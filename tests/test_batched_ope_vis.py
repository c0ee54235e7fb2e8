"""Batched OPE driver + visualization tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mmtrack_tpu.data.synthetic import make_synthetic_sequence
from mmtrack_tpu.eval.batched_ope import bucket_sequences, run_dataset_batched
from mmtrack_tpu.eval.datasets import EvalSequence
from mmtrack_tpu.eval.ope import run_sequence
from mmtrack_tpu.models.vipt import ViPTrack
from mmtrack_tpu.parallel.batched_eval import BatchedViPTTracker
from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime, ViPTTracker
from mmtrack_tpu.vis import TrackingVisualizer, ce_token_mask, draw_box, plot_curves, score_map_heatmap

TINY = dict(embed_dim=32, depth=2, num_heads=2, patch_size=16,
            template_size=32, search_size=64, ce_loc=(1,), head_channel=16)
RT = ViPTRuntime(template_size=32, search_size=64, stride=16,
                 ce_loc=(1,), ce_keep_ratio=(0.7,))


def _setup():
    model = ViPTrack(**TINY)
    z = jnp.zeros((1, 32, 32, 6))
    x = jnp.zeros((1, 64, 64, 6))
    params = jax.jit(lambda r: model.init(r, z, x, None, RT.ce_keep_lens))(
        jax.random.PRNGKey(0))
    return model, params


def test_batched_ope_matches_sequential(tmp_path):
    model, params = _setup()
    seqs, loaders = [], {}
    lengths = [5, 3]  # unequal lengths exercise the idle-tail path
    for i, n in enumerate(lengths):
        frames, gt = make_synthetic_sequence(n_frames=n, height=96, width=128,
                                             seed=i, box0=(30.0 + 5 * i, 20.0, 24.0, 20.0))
        seqs.append(EvalSequence(f"b{i}", [None] * n, [None] * n, gt))
        loaders[f"b{i}"] = (lambda f: (lambda t: f[t]))(frames)

    assert len(bucket_sequences(seqs, loaders)) == 1

    out = run_dataset_batched(
        lambda: BatchedViPTTracker(model, params, RT), seqs,
        str(tmp_path), "DS", "cfg", batch_size=2, loaders=loaders,
        verbose=False)
    assert len(out) == 2
    assert out[0]["boxes"].shape == (5, 4)
    assert out[1]["boxes"].shape == (3, 4)

    # must match the sequential tracker trajectory
    for i, n in enumerate(lengths):
        seq_tracker = ViPTTracker(model, params, RT)
        res = run_sequence(seq_tracker, seqs[i], frame_loader=loaders[f"b{i}"])
        np.testing.assert_allclose(out[i]["boxes"], res["boxes"], atol=1e-3)

    # resume: second run skips everything
    out2 = run_dataset_batched(
        lambda: BatchedViPTTracker(model, params, RT), seqs,
        str(tmp_path), "DS", "cfg", batch_size=2, loaders=loaders,
        verbose=False)
    assert out2 == []


def test_visualizer_and_plots(tmp_path):
    frames, gt = make_synthetic_sequence(n_frames=3, height=80, width=100)
    vis = TrackingVisualizer(str(tmp_path / "vis"))
    score = np.random.RandomState(0).rand(16, 16)
    for t in range(3):
        vis.add_frame(t, frames[t], gt[t], score_map=score, gt_box=gt[t],
                      score=0.9)
    idx = vis.write_index()
    assert os.path.exists(idx)
    assert len([f for f in os.listdir(tmp_path / "vis") if f.endswith(".jpg")]) == 3

    im = draw_box(frames[0], gt[0], label="x")
    assert im.shape == (80, 100, 3)
    hm = score_map_heatmap(score, (64, 64))
    assert hm.shape == (64, 64, 3)

    mask = ce_token_mask([np.array([0, 1]), np.array([5])], grid=4)
    assert mask.shape == (4, 4)
    assert mask.reshape(-1)[0] == np.float32(0.7)
    assert mask.reshape(-1)[5] == np.float32(0.5)

    p = plot_curves({"succ": np.linspace(1, 0, 21)}, "overlap", "success",
                    str(tmp_path / "curve.png"))
    assert os.path.exists(p)


def test_batched_ope_split_stream_matches_host_compose(tmp_path):
    """Disk-backed rgbcolormap batches take the rgb+JET-index streaming path
    (4 B/px, device-side colormap, lookahead decode thread) — trajectories
    must equal the host-composed full-frame path exactly."""
    import cv2

    model, params = _setup()
    rng = np.random.RandomState(3)
    seqs = []
    lengths = [5, 3]
    for i, n in enumerate(lengths):
        frames, gt = make_synthetic_sequence(n_frames=n, height=96, width=128,
                                             seed=10 + i,
                                             box0=(30.0 + 5 * i, 20.0, 24.0, 20.0))
        cdir = tmp_path / f"s{i}" / "color"
        ddir = tmp_path / f"s{i}" / "depth"
        cdir.mkdir(parents=True)
        ddir.mkdir(parents=True)
        rgb_paths, d_paths = [], []
        base = rng.randint(500, 4000, (96, 128)).astype(np.uint16)
        for t in range(n):
            cp = str(cdir / f"{t:04d}.jpg")
            dp = str(ddir / f"{t:04d}.png")
            cv2.imwrite(cp, frames[t][..., :3][..., ::-1])
            cv2.imwrite(dp, (base + 7 * t).astype(np.uint16))
            rgb_paths.append(cp)
            d_paths.append(dp)
        seqs.append(EvalSequence(f"s{i}", rgb_paths, d_paths, gt,
                                 dtype="rgbcolormap", depth_clip=True))

    out = run_dataset_batched(
        lambda: BatchedViPTTracker(model, params, RT), seqs,
        str(tmp_path / "r1"), "DS", "cfg", batch_size=2, verbose=False)

    # sequential reference over the host-composed frames
    from mmtrack_tpu.eval.ope import run_sequence as _run_seq
    for i, n in enumerate(lengths):
        res = _run_seq(ViPTTracker(model, params, RT), seqs[i])
        np.testing.assert_allclose(out[i]["boxes"], res["boxes"], atol=1e-3)


def test_batched_ope_yuv_stream_mode(tmp_path, monkeypatch):
    """MMTRACK_STREAM=yuv420 opt-in: raw 4:2:0 wire format. Not bit-exact
    (decode-grade ±1 LSB), so assert the run completes and the boxes stay
    within a loose IoU band of the exact-path run."""
    import cv2

    from mmtrack_tpu.eval.metrics import iou_xywh

    model, params = _setup()
    rng = np.random.RandomState(7)
    n = 4
    frames, gt = make_synthetic_sequence(n_frames=n, height=96, width=128,
                                         seed=30, box0=(30.0, 20.0, 24.0, 20.0))
    cdir = tmp_path / "s0" / "color"
    ddir = tmp_path / "s0" / "depth"
    cdir.mkdir(parents=True)
    ddir.mkdir(parents=True)
    base = rng.randint(500, 4000, (96, 128)).astype(np.uint16)
    rgb_paths, d_paths = [], []
    for t in range(n):
        cp, dp = str(cdir / f"{t:04d}.jpg"), str(ddir / f"{t:04d}.png")
        cv2.imwrite(cp, frames[t][..., :3][..., ::-1])
        cv2.imwrite(dp, (base + 7 * t).astype(np.uint16))
        rgb_paths.append(cp)
        d_paths.append(dp)
    seq = EvalSequence("s0", rgb_paths, d_paths, gt, dtype="rgbcolormap",
                       depth_clip=True)

    exact = run_dataset_batched(
        lambda: BatchedViPTTracker(model, params, RT), [seq],
        str(tmp_path / "r1"), "DS", "cfg", batch_size=1, verbose=False)
    monkeypatch.setenv("MMTRACK_STREAM", "yuv420")
    yuv = run_dataset_batched(
        lambda: BatchedViPTTracker(model, params, RT), [seq],
        str(tmp_path / "r2"), "DS", "cfg", batch_size=1, verbose=False)
    assert yuv[0]["boxes"].shape == (n, 4)
    ious = [iou_xywh(a, b) for a, b in zip(exact[0]["boxes"][1:],
                                           yuv[0]["boxes"][1:])]
    assert min(ious) > 0.6, ious
