"""Metric-level A/B of the streaming wire formats (round-5 PERF task 2).

The bench headline rides the minimum-byte qualified wire (raw 4:2:0 planes,
2.5 B/px); its metric impact had only been asserted from the <=1-LSB pixel
bound (docs/PERF.md wire table). This tool MEASURES it: a real-sized
synthetic OPE corpus (default 20 sequences x 101 frames, 320x240 jpeg +
16-bit depth png on disk — the same fixture pipeline as bench.py) is
tracked end-to-end under each wire:

  host      — full host composition (data/composition.py::get_x_frame),
              the reference's own path; the baseline.
  rgbindex  — native decode to RGB + JET index, colormap gather on device
              (4 B/px; bit-exact vs host by construction).
  yuv420    — raw 4:2:0 planes + JET index; chroma upsample + BT.601 on
              device (2.5 B/px; <=1 LSB vs cv2's decode on pixels).

and the per-wire SR/PR/NPR (eval/metrics.py::evaluate_ope) deltas vs the
host wire are reported, plus direct box-level deviations between wires.

A model with RANDOM weights would make the measurement meaningless: its
score maps are noise fields whose argmax flips under 1-LSB perturbations,
wildly overstating wire sensitivity vs any trained model. So the tool
first makes the model TRACK: it overfits ONLY the center head (backbone
and prompts stay seeded — same recipe as tools/parity/overfit_donors.py::
overfit_vipt_head, including the wide scale jitter + exact logit-space
size-bias calibration that stabilize the crop-size feedback loop) on
composed crops of held-out corpus sequences, ON the accelerator.

Run (TPU): PYTHONPATH=/root/repo python tools/wire_metric_ab.py
Prints one JSON line per wire + a summary; writes
docs/artifacts/wire_metric_ab.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO, ".wire_ab_fixtures")
ART = os.path.join(REPO, "docs", "artifacts", "wire_metric_ab.json")

H, W = 240, 320


def ensure_fixtures(n_seq: int, n_frames: int):
    """jpeg+png sequences with per-sequence randomized central
    trajectories; the depth plane carries the target (near plane) so the
    composed aux channels are informative, like the training corpus."""
    import cv2

    marker = os.path.join(FIXTURE_DIR, f"ok_{n_seq}x{n_frames}_{H}x{W}")
    if os.path.exists(marker):
        return
    rng = np.random.RandomState(7)
    for b in range(n_seq):
        from mmtrack_tpu.data.synthetic import make_synthetic_sequence

        w0, h0 = int(rng.uniform(36, 60)), int(rng.uniform(28, 46))
        x0 = rng.uniform(0.3, 0.6) * (W - w0)
        y0 = rng.uniform(0.3, 0.6) * (H - h0)
        vel = (float(rng.uniform(-2.5, 2.5)), float(rng.uniform(-1.8, 1.8)))
        frames, gt = make_synthetic_sequence(
            n_frames=n_frames, height=H, width=W, seed=1000 + b,
            box0=(x0, y0, float(w0), float(h0)), velocity=vel)
        cdir = os.path.join(FIXTURE_DIR, f"seq{b:02d}", "color")
        ddir = os.path.join(FIXTURE_DIR, f"seq{b:02d}", "depth")
        os.makedirs(cdir, exist_ok=True)
        os.makedirs(ddir, exist_ok=True)
        drng = np.random.RandomState(b)
        depth_bg = drng.randint(2500, 3500, (H, W), np.uint16)
        np.save(os.path.join(FIXTURE_DIR, f"seq{b:02d}", "gt.npy"), gt)
        for t in range(n_frames):
            cv2.imwrite(os.path.join(cdir, f"{t:04d}.jpg"),
                        frames[t][..., :3][..., ::-1])
            depth = depth_bg.copy()
            x, y, bw, bh = [int(round(v)) for v in gt[t]]
            depth[max(y, 0):y + bh, max(x, 0):x + bw] = 800  # near target
            cv2.imwrite(os.path.join(ddir, f"{t:04d}.png"), depth)
    open(marker, "w").close()


def paths(b: int, t: int):
    sd = os.path.join(FIXTURE_DIR, f"seq{b:02d}")
    return (os.path.join(sd, "color", f"{t:04d}.jpg"),
            os.path.join(sd, "depth", f"{t:04d}.png"))


def compose_host(b: int, t: int) -> np.ndarray:
    from mmtrack_tpu.data.composition import get_x_frame

    jp, pp = paths(b, t)
    return get_x_frame(jp, pp, "rgbcolormap", depth_clip=True)


def overfit_head_on_device(model, params, n_seq_train: int, n_frames: int,
                           steps: int, log_every: int = 200):
    """Train ONLY box_head (BCE on the inverted clamped-sigmoid logits,
    wide scale jitter, post-train exact size-bias calibration) on host-
    composed crops of the first n_seq_train sequences. Runs the full
    fwd+bwd on the accelerator with grads masked to the head — at TPU
    speed the wasted backbone bwd is cheaper than plumbing a head-only
    apply."""
    import jax
    import jax.numpy as jnp
    import optax

    from mmtrack_tpu.ops.crop import sample_target_np
    from mmtrack_tpu.trackers.vipt_tracker import MEAN_6CH, STD_6CH

    sf, ssz = 4.0, 256
    stride, feat_sz = 16, 16
    mean = np.asarray(MEAN_6CH, np.float32)
    std = np.asarray(STD_6CH, np.float32)
    rng = np.random.RandomState(0)

    zs, xs, scl, szl, ofl, idxs, nbs = [], [], [], [], [], [], []
    k = np.arange(feat_sz, dtype=np.float64)
    for b in range(n_seq_train):
        gt = np.load(os.path.join(FIXTURE_DIR, f"seq{b:02d}", "gt.npy"))
        z_crop, _, _ = sample_target_np(compose_host(b, 0),
                                        gt[0].astype(np.float64), 2.0, 128)
        z = (z_crop.astype(np.float32) / 255.0 - mean) / std
        for t in range(0, n_frames, 10):
            frame = compose_host(b, t)
            x0, y0, w, h = [float(v) for v in gt[t]]
            cx, cy = x0 + 0.5 * w, y0 + 0.5 * h
            for j in range(2):
                if j == 0:
                    jb = [x0, y0, w, h]
                else:
                    dx, dy = rng.uniform(-0.25, 0.25, 2) * math.sqrt(w * h)
                    ds = math.exp(rng.uniform(-0.25, 0.25))
                    jw, jh = w * ds, h * ds
                    jb = [cx + dx - 0.5 * jw, cy + dy - 0.5 * jh, jw, jh]
                crop, rf, _ = sample_target_np(frame, np.asarray(jb), sf, ssz)
                xw = (crop.astype(np.float32) / 255.0 - mean) / std
                jcx, jcy = jb[0] + 0.5 * jb[2], jb[1] + 0.5 * jb[3]
                gx = ((cx - jcx) * rf + 0.5 * ssz) / stride
                gy = ((cy - jcy) * rf + 0.5 * ssz) / stride
                ix, iy = int(gx), int(gy)
                if not (0 <= ix < feat_sz and 0 <= iy < feat_sz):
                    continue
                lab = np.exp(-0.5 * ((k[None, :] - gx) ** 2
                                     + (k[:, None] - gy) ** 2))
                nb = [(iy + dy2) * feat_sz + (ix + dx2)
                      for dy2 in (-1, 0, 1) for dx2 in (-1, 0, 1)
                      if 0 <= iy + dy2 < feat_sz and 0 <= ix + dx2 < feat_sz]
                nb = (nb + [iy * feat_sz + ix] * 9)[:9]
                zs.append(z)
                xs.append(xw)
                scl.append(lab.astype(np.float32))
                szl.append([w * rf / ssz, h * rf / ssz])
                ofl.append([gx - ix, gy - iy])
                idxs.append(iy * feat_sz + ix)
                nbs.append(nb)
    data = dict(z=jnp.asarray(np.stack(zs)), x=jnp.asarray(np.stack(xs)),
                sc=jnp.asarray(np.stack(scl)),
                sz=jnp.asarray(np.asarray(szl, np.float32)),
                of=jnp.asarray(np.asarray(ofl, np.float32)),
                idx=jnp.asarray(np.asarray(idxs, np.int32)),
                nb=jnp.asarray(np.asarray(nbs, np.int32)))
    N = data["z"].shape[0]
    print(f"head overfit: {N} crops cached", flush=True)

    def logit(p):
        return jnp.log(p) - jnp.log1p(-p)

    from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime

    rt = ViPTRuntime()  # deep defaults: ce_keep_lens for deep_rgbd

    def loss_fn(p, i):
        out = model.apply(p, data["z"][i][None], data["x"][i][None],
                          None, rt.ce_keep_lens)
        sc_log = logit(out["score_map"][0])
        sc = optax.sigmoid_binary_cross_entropy(sc_log, data["sc"][i]).mean()
        sz_log = logit(out["size_map"][0].reshape(-1, 2)[data["nb"][i]])
        sz = optax.sigmoid_binary_cross_entropy(
            sz_log, jnp.tile(data["sz"][i][None], (9, 1))).mean()
        of = jnp.abs(out["offset_map"][0].reshape(-1, 2)[data["idx"][i]]
                     - data["of"][i]).mean()
        return sc + 2.0 * sz + 0.2 * of

    import flax.traverse_util as tu

    flat = tu.flatten_dict(params["params"])
    mask = {"params": tu.unflatten_dict(
        {kp: (kp[0] == "box_head") for kp in flat})}
    sched = optax.piecewise_constant_schedule(2e-3, {steps // 2: 0.25})
    tx = optax.chain(optax.masked(optax.adam(sched), mask),
                     optax.masked(optax.set_to_zero(),
                                  jax.tree.map(lambda m: not m, mask)))
    opt_state = tx.init(params)

    import jax.random as jr

    @jax.jit
    def train_step(p, o, i):
        l, g = jax.value_and_grad(loss_fn)(p, i)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    order = np.arange(N)
    for it in range(steps):
        if it % N == 0:
            np.random.RandomState(it).shuffle(order)
        params, opt_state, l = train_step(params, opt_state,
                                          jnp.asarray(order[it % N]))
        if log_every and it % log_every == 0:
            print(f"  step {it}: loss {float(l):.4f}", flush=True)

    # exact size-bias calibration (logit space), as in overfit_vipt_head
    @jax.jit
    def size_logits(p, i):
        out = model.apply(p, data["z"][i][None], data["x"][i][None],
                          None, rt.ce_keep_lens)
        return logit(out["size_map"][0].reshape(-1, 2)[data["idx"][i]])

    dsum = np.zeros(2)
    for i in range(N):
        lab = np.asarray(data["sz"][i], np.float64)
        dsum += np.log(lab / (1 - lab)) - np.asarray(
            size_logits(params, jnp.asarray(i)), np.float64)
    delta = dsum / N
    flatp = tu.flatten_dict(params["params"])
    bias_keys = sorted(kp for kp in flatp
                       if kp[0] == "box_head" and "size" in kp
                       and kp[-1] == "bias")
    last = bias_keys[-1]
    assert flatp[last].shape == (2,), (last, flatp[last].shape)
    flatp[last] = flatp[last] + jnp.asarray(delta, flatp[last].dtype)
    params = {"params": tu.unflatten_dict(flatp)}
    print(f"size-bias calibration: logit delta {delta.round(4).tolist()} "
          f"on {'/'.join(last)}", flush=True)
    return params


def run_wire(wire: str, model, params, rt, n_seq: int, n_frames: int):
    """Track all sequences in one device batch under `wire`; returns
    (boxes (n_seq, n_frames-1, 4), seconds)."""
    import jax.numpy as jnp

    from mmtrack_tpu.data.native_io import (decode_pair_rgb_index,
                                            decode_pair_yuv_index)
    from mmtrack_tpu.parallel.batched_eval import BatchedViPTTracker

    gts = [np.load(os.path.join(FIXTURE_DIR, f"seq{b:02d}", "gt.npy"))
           for b in range(n_seq)]
    f0 = np.stack([compose_host(b, 0) for b in range(n_seq)])
    b0 = np.stack([g[0] for g in gts]).astype(np.float32)

    tracker = BatchedViPTTracker(model, params, rt)
    tracker.initialize(f0, b0)

    rgb = np.zeros((n_seq, H, W, 3), np.uint8)
    idx = np.zeros((n_seq, H, W), np.uint8)
    y = np.zeros((n_seq, H, W), np.uint8)
    cb = np.zeros((n_seq, H // 2, W // 2), np.uint8)
    cr = np.zeros((n_seq, H // 2, W // 2), np.uint8)

    boxes = []
    t0 = time.perf_counter()
    for t in range(1, n_frames):
        if wire == "host":
            frames = np.stack([compose_host(b, t) for b in range(n_seq)])
            bx, _ = tracker.track(frames)
        elif wire == "rgbindex":
            for b in range(n_seq):
                jp, pp = paths(b, t)
                decode_pair_rgb_index(jp, pp, rgb[b], idx[b], clip=True)
            bx, _ = tracker.track_split(rgb, idx)
        else:
            for b in range(n_seq):
                jp, pp = paths(b, t)
                ok = decode_pair_yuv_index(jp, pp, y[b], cb[b], cr[b],
                                           idx[b], clip=True)
                assert ok, "yuv wire unavailable for fixture"
            bx, _ = tracker.track_yuv(y, cb, cr, idx)
        boxes.append(bx.copy())
    dt = time.perf_counter() - t0
    return np.stack(boxes, axis=1), dt  # (n_seq, T-1, 4)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-seq", type=int, default=20)
    ap.add_argument("--n-frames", type=int, default=101)
    ap.add_argument("--train-seqs", type=int, default=8,
                    help="corpus sequences used for the head overfit "
                         "(tracking runs on ALL sequences; deltas are "
                         "wire-vs-wire on identical trajectories, so "
                         "train/eval overlap does not bias them)")
    ap.add_argument("--steps", type=int, default=1500)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.config import vipt_experiment_config
    from mmtrack_tpu.eval.metrics import evaluate_ope
    from mmtrack_tpu.models.vipt import build_viptrack
    from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime
    from mmtrack_tpu.utils.env import enable_compile_cache

    enable_compile_cache()
    ensure_fixtures(args.n_seq, args.n_frames)

    cfg = vipt_experiment_config("deep_rgbd")
    rt = ViPTRuntime.from_config(cfg)
    model = build_viptrack(cfg, dtype=jnp.bfloat16)  # the SERVING dtype
    z = jnp.zeros((1, 128, 128, 6), jnp.float32)
    x = jnp.zeros((1, 256, 256, 6), jnp.float32)
    params = jax.jit(lambda r: model.init(r, z, x, None, rt.ce_keep_lens))(
        jax.random.PRNGKey(0))

    params = overfit_head_on_device(model, params, args.train_seqs,
                                    args.n_frames, args.steps)

    gts = [np.load(os.path.join(FIXTURE_DIR, f"seq{b:02d}", "gt.npy"))
           for b in range(args.n_seq)]

    results = {}
    all_boxes = {}
    for wire in ("host", "rgbindex", "yuv420"):
        boxes, dt = run_wire(wire, model, params, rt,
                             args.n_seq, args.n_frames)
        all_boxes[wire] = boxes
        per_seq = [evaluate_ope(boxes[b], gts[b][1:])
                   for b in range(args.n_seq)]
        agg = {k: float(np.mean([m[k] for m in per_seq]))
               for k in ("success_auc", "precision_20px",
                         "norm_precision_auc")}
        results[wire] = agg
        print(json.dumps({"wire": wire, "seconds": round(dt, 1), **{
            k: round(v, 5) for k, v in agg.items()}}), flush=True)

    deltas = {}
    for wire in ("rgbindex", "yuv420"):
        d = {f"d_{k}": abs(results[wire][k] - results["host"][k])
             for k in results["host"]}
        bd = np.abs(all_boxes[wire] - all_boxes["host"])
        same = np.mean(bd.max(axis=2) < 0.01)
        d["max_box_dev_px"] = float(bd.max())
        d["frac_frames_boxes_equal"] = float(same)
        deltas[wire] = d

    summary = {
        "corpus": {"n_seq": args.n_seq, "n_frames": args.n_frames,
                   "resolution": f"{W}x{H}", "composition": "rgbcolormap",
                   "note": ("the rgb+index and yuv wires are byte-layout "
                            "optimizations of the rgbcolormap composition; "
                            "other MM compositions share the same "
                            "transform classes (exact index gather / "
                            "<=1-LSB yuv rgb)")},
        "metrics": results,
        "deltas_vs_host": {w: {k: round(v, 6) for k, v in d.items()}
                           for w, d in deltas.items()},
        "budget_clause": "<=0.001 absolute on SR/PR/NPR (the 0.1% clause)",
        "within_budget": {
            w: bool(all(v <= 0.001 for k, v in d.items()
                        if k.startswith("d_")))
            for w, d in deltas.items()},
    }
    os.makedirs(os.path.dirname(ART), exist_ok=True)
    with open(ART, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
