"""End-to-end learning demonstration: held-out tracking metric improves.

Every training recipe in this repo is unit-tested by one-batch overfit
smokes; this tool demonstrates the ENGINE end to end — the reference's
train_script.py:23-90 purpose, not its API — by training through
tools/train.py (sampler -> processing -> BatchLoader -> pjit train step ->
LR schedule -> orbax checkpoint -> RESUME) on a synthetic multi-sequence
corpus and measuring OPE metrics (mean IoU / AUC / SR@0.5) on HELD-OUT
synthetic sequences the sampler never saw:

  stage 1 (foundation): tools/train.py --script vipt --full_tune on the
      configs/demo/tiny_synthetic.yaml model over an RGB-ONLY corpus (the
      target is drawn only in the RGB triplet; aux channels are pure
      background — the OSTrack-pretrain analog), run as TWO invocations
      (--epochs N/2 then --epochs N) so the second provably resumes from
      the orbax checkpoint, exactly like a crash-restart
      (base_trainer.py:62-111 semantics). Eval before (random init) and
      after on held-out RGB-only sequences.
  stage 2 (the ViPT prompt path): adapt the frozen stage-1 foundation to a
      NEW MODALITY — a corpus where the target is INVISIBLE in RGB and
      carried only by the aux triplet (the depth/thermal/event setting
      ViPT exists for) — by prompt-only tuning from the stage-1 checkpoint
      (the 0.84M-analog path, base_functions.py:171-196 semantics). Eval
      on held-out aux-only sequences before (foundation alone: near
      chance, it never saw aux signal) and after: the improvement is
      attributable to the prompt parameters alone, since nothing else
      trains.

Run:  python tools/learning_demo.py [--epochs 8] [--out docs/artifacts/learning_demo.json]
CPU: ~10-20 min single core. TPU chip: ~1-2 min.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CFG_PATH = os.path.join(REPO, "configs", "demo", "tiny_synthetic.yaml")

# held-out sequences: the train corpus (SyntheticVideoDataset in
# tools/train.py --synthetic) uses seeds 0-7, boxes (20+10i, 15+5i, 30, 24)
# and velocities (2+i, 1.5) at 120x160; these differ in all of them
HELDOUT = [
    dict(seed=101, box0=(95.0, 20.0, 26.0, 34.0), velocity=(-2.5, 2.0)),
    dict(seed=102, box0=(30.0, 60.0, 36.0, 22.0), velocity=(3.0, -1.0)),
    dict(seed=103, box0=(70.0, 70.0, 24.0, 24.0), velocity=(-1.5, -2.5)),
    dict(seed=104, box0=(15.0, 30.0, 40.0, 30.0), velocity=(2.0, 2.5)),
]
N_FRAMES = 40


def _load_cfg():
    from mmtrack_tpu.config import vipt_default_config

    cfg = vipt_default_config()
    cfg.merge_from_yaml(CFG_PATH)
    return cfg


def _build(cfg):
    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.models.vipt import build_viptrack, generate_ctr_mask
    from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime

    model = build_viptrack(cfg)
    rt = ViPTRuntime.from_config(cfg)
    z = jnp.zeros((1, cfg.DATA.TEMPLATE.SIZE, cfg.DATA.TEMPLATE.SIZE, 6))
    x = jnp.zeros((1, cfg.DATA.SEARCH.SIZE, cfg.DATA.SEARCH.SIZE, 6))
    mask_z = generate_ctr_mask(cfg.DATA.TEMPLATE.SIZE // cfg.MODEL.BACKBONE.STRIDE,
                               cfg.MODEL.BACKBONE.CE_TEMPLATE_RANGE)
    init = jax.jit(lambda r: model.init(r, z, x, mask_z, rt.ce_keep_lens))
    return model, rt, init


def evaluate_factory(make_tracker, modality: str = "both") -> dict:
    """OPE over the held-out sequences: mean IoU, success AUC, SR@0.5."""
    from mmtrack_tpu.data.synthetic import make_synthetic_sequence
    from mmtrack_tpu.eval.metrics import iou_xywh, success_auc

    kw = {"both": {}, "rgb_only": {"target_aux": None},
          "aux_only": {"target_rgb": None}}[modality]
    ious = []
    for spec in HELDOUT:
        frames, gt = make_synthetic_sequence(
            n_frames=N_FRAMES, height=120, width=160, **spec, **kw)
        tr = make_tracker()
        tr.initialize(frames[0], {"init_bbox": gt[0].tolist()})
        pred = [gt[0]]
        for t in range(1, len(frames)):
            pred.append(tr.track(frames[t])["target_bbox"])
        ious.append(iou_xywh(np.asarray(pred[1:], np.float64), gt[1:]))
    ious = np.concatenate(ious)
    return {
        "mean_iou": float(ious.mean()),
        "auc": float(success_auc(ious)),
        "sr50": float((ious > 0.5).mean()),
    }


def evaluate(model, rt, params, modality: str = "both") -> dict:
    from mmtrack_tpu.trackers.vipt_tracker import ViPTTracker

    return evaluate_factory(lambda: ViPTTracker(model, params, rt),
                            modality=modality)


def _run_train(save_dir: str, epochs: int, extra: list[str]) -> None:
    cmd = [sys.executable, os.path.join(REPO, "tools", "train.py"),
           "--script", "vipt", "--config", CFG_PATH, "--synthetic",
           "--save_dir", save_dir, "--epochs", str(epochs), "--seed", "7",
           *extra]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)


def _latest_ckpt(save_dir: str) -> str:
    cfg_name = os.path.splitext(os.path.basename(CFG_PATH))[0]
    root = os.path.join(save_dir, f"vipt-{cfg_name}", "checkpoints")
    steps = sorted(int(os.path.basename(p)) for p in glob.glob(
        os.path.join(root, "[0-9]*")) if os.path.basename(p).isdigit())
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {root}")
    d = os.path.join(root, str(steps[-1]))
    return os.path.join(d, "default") if os.path.isdir(
        os.path.join(d, "default")) else d


def _restore_params(ckpt_path: str, template_params):
    import orbax.checkpoint as ocp

    from mmtrack_tpu.models.convert import load_into

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(ckpt_path))
    src = restored.get("params", restored)
    while "params" in src and isinstance(src["params"], dict) \
            and "params" not in template_params:
        src = src["params"]
    if "params" in src and "params" in template_params:
        loaded, missing, unexpected = load_into(
            template_params["params"], src["params"])
        assert not missing and not unexpected, (missing[:4], unexpected[:4])
        return {**template_params, "params": loaded}
    loaded, missing, unexpected = load_into(template_params, src)
    assert not missing and not unexpected, (missing[:4], unexpected[:4])
    return loaded


def run_dimp_phase(args, workdir: str) -> dict:
    """The online-family recipe (DiMP): offline-train the full DiMPNet
    (ResNet-50 + meta-learned filter init/optimizer + IoUNet) on the
    synthetic corpus through tools/train.py, eval the ONLINE tracker
    (init augmentation, steepest-descent filter solve, IoUNet refinement,
    memory updates) on held-out sequences before and after. Heavier than
    the tiny stages — minutes on a TPU chip, ~an hour CPU — hence opt-in."""
    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.models.dimp import DiMPNet
    from mmtrack_tpu.trackers.dimp_tracker import DiMPTracker

    model = DiMPNet()
    # identical init-shape protocol to tools/train.py::_train_dimp so the
    # random params serve as the orbax restore template
    im = jnp.zeros((1, 288, 288, 6))
    bb = jnp.asarray([[100.0, 100.0, 80.0, 80.0]])
    props = jnp.asarray([[[100.0, 100.0, 80.0, 80.0]] * 8])
    params0 = jax.jit(lambda r: model.init(r, im, im, bb, props))(
        jax.random.PRNGKey(7))

    print("== dimp eval: random init", flush=True)
    before = evaluate_factory(lambda: DiMPTracker(model, params0))
    print(json.dumps(before), flush=True)

    d = os.path.join(workdir, "dimp")
    cmd = [sys.executable, os.path.join(REPO, "tools", "train.py"),
           "--script", "dimp", "--config", CFG_PATH, "--synthetic",
           "--save_dir", d, "--epochs", str(args.dimp_epochs),
           "--batch", "8", "--samples", "64", "--seed", "7"]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, cwd=REPO)

    root = os.path.join(d, "dimp", "checkpoints")
    steps = sorted(int(os.path.basename(p)) for p in glob.glob(
        os.path.join(root, "[0-9]*")) if os.path.basename(p).isdigit())
    ck = os.path.join(root, str(steps[-1]))
    if os.path.isdir(os.path.join(ck, "default")):
        ck = os.path.join(ck, "default")
    params1 = _restore_params(ck, params0)

    print("== dimp eval: after offline training", flush=True)
    after = evaluate_factory(lambda: DiMPTracker(model, params1))
    print(json.dumps(after), flush=True)
    return {"epochs": args.dimp_epochs, "before": before, "after": after,
            "improved": bool(after["auc"] > before["auc"] + 0.02)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8,
                    help="stage-1 total epochs (first run trains half)")
    ap.add_argument("--prompt_epochs", type=int, default=6)
    ap.add_argument("--dimp", action="store_true",
                    help="also run the DiMP online-family phase (full "
                         "ResNet-50 DiMPNet; minutes on TPU, slow on CPU)")
    ap.add_argument("--dimp_only", action="store_true",
                    help="run ONLY the DiMP phase, merging into an existing "
                         "--out artifact (stage 1/2 results kept)")
    ap.add_argument("--dimp_epochs", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "artifacts", "learning_demo.json"))
    ap.add_argument("--workdir", default=None,
                    help="keep training workspace here (default: temp dir)")
    args = ap.parse_args(argv)

    import jax

    workdir = args.workdir or tempfile.mkdtemp(prefix="mmtrack_demo_")

    if args.dimp_only:
        result = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                result = json.load(f)
        result["dimp_online_family"] = run_dimp_phase(args, workdir)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result["dimp_online_family"], indent=2))
        ok = result["dimp_online_family"]["improved"]
        print("DIMP PHASE:", "PASS" if ok else "FAIL")
        return 0 if ok else 1

    cfg = _load_cfg()
    model, rt, init_fn = _build(cfg)
    params0 = init_fn(jax.random.PRNGKey(7))  # train.py --seed 7 init

    print("== eval: random init (before any training)", flush=True)
    before = evaluate(model, rt, params0, modality="rgb_only")
    print(json.dumps(before), flush=True)

    # ---- stage 1: RGB foundation training, with a checkpoint-resume break
    s1 = os.path.join(workdir, "stage1")
    rgb = ["--full_tune", "--synthetic_modality", "rgb_only"]
    _run_train(s1, max(args.epochs // 2, 1), rgb)
    _run_train(s1, args.epochs, rgb)   # resumes from epoch N/2
    ckpt1 = _latest_ckpt(s1)
    params1 = _restore_params(ckpt1, params0)

    print("== eval: after stage-1 foundation training (rgb_only heldout)",
          flush=True)
    after1 = evaluate(model, rt, params1, modality="rgb_only")
    print(json.dumps(after1), flush=True)

    # ---- stage 2: prompt-tune the frozen foundation onto a NEW modality
    # (target invisible in RGB, carried by the aux triplet) — only the
    # prompt parameters train, from the stage-1 checkpoint
    print("== eval: stage-1 foundation on the NEW modality (aux_only)",
          flush=True)
    before2 = evaluate(model, rt, params1, modality="aux_only")
    print(json.dumps(before2), flush=True)

    s2 = os.path.join(workdir, "stage2")
    _run_train(s2, args.prompt_epochs,
               ["--init", ckpt1, "--synthetic_modality", "aux_only"])
    params2 = _restore_params(_latest_ckpt(s2), params0)

    print("== eval: after prompt-only tuning (aux_only heldout)", flush=True)
    after2 = evaluate(model, rt, params2, modality="aux_only")
    print(json.dumps(after2), flush=True)

    result = {
        "config": os.path.relpath(CFG_PATH, REPO),
        "heldout_sequences": len(HELDOUT),
        "frames_per_sequence": N_FRAMES,
        "stage1": {"epochs": args.epochs, "corpus": "rgb_only",
                   "before": before, "after": after1,
                   "resumed_from_checkpoint": True},
        "stage2_prompt_only": {"epochs": args.prompt_epochs,
                               "corpus": "aux_only (new modality)",
                               "before": before2, "after": after2},
        "stage1_improved": bool(after1["auc"] > before["auc"] + 0.05),
        "prompt_tuning_improved": bool(after2["auc"] > before2["auc"] + 0.02),
        "backend": jax.default_backend(),
    }
    if args.dimp:
        result["dimp_online_family"] = run_dimp_phase(args, workdir)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    ok = result["stage1_improved"] and result["prompt_tuning_improved"]
    print("LEARNING DEMO:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
