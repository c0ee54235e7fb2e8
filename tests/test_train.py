"""Training engine + parallelism tests (8 virtual CPU devices)."""

from functools import partial

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmtrack_tpu.models.vipt import ViPTrack, ce_keep_schedule, generate_ctr_mask
from mmtrack_tpu.parallel.batched_eval import BatchedViPTTracker
from mmtrack_tpu.parallel.mesh import make_mesh, process_local_slice, replicate, shard_batch
from mmtrack_tpu.train.actor import adjust_keep_rate, quantize_keep_rate, vipt_forward_and_loss
from mmtrack_tpu.train.optim import build_optimizer, count_trainable, prompt_only_mask
from mmtrack_tpu.train.train_step import TrainState, make_train_step, shard_train_step
from mmtrack_tpu.trackers.vipt_tracker import ViPTRuntime, ViPTTracker
from mmtrack_tpu.data.synthetic import make_synthetic_sequence

TINY = dict(embed_dim=32, depth=2, num_heads=2, patch_size=16,
            template_size=32, search_size=64, ce_loc=(1,),
            prompt_type="vipt_deep", head_channel=16)
KEEP = ce_keep_schedule(16, (1,), (0.7,))
MASK_Z = generate_ctr_mask(2, "CTR_POINT")


def _model_and_params(B=4):
    model = ViPTrack(**TINY)
    z = jnp.zeros((B, 32, 32, 6))
    x = jnp.zeros((B, 64, 64, 6))
    params = jax.jit(lambda r: model.init(r, z, x, MASK_Z, KEEP))(jax.random.PRNGKey(0))
    return model, params


def _batch(B=4, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "template": jnp.asarray(rng.randn(B, 32, 32, 6).astype(np.float32)),
        "search": jnp.asarray(rng.randn(B, 64, 64, 6).astype(np.float32)),
        "search_anno": jnp.asarray(rng.uniform(0.25, 0.4, (B, 4)).astype(np.float32)),
    }


def test_keep_rate_schedule():
    assert adjust_keep_rate(0, 4, 20) == 1.0
    assert adjust_keep_rate(3, 4, 20) == 1.0
    assert adjust_keep_rate(25, 4, 20) == 0.7
    mid = adjust_keep_rate(12, 4, 20)
    assert 0.7 < mid < 1.0
    assert quantize_keep_rate(0.73) == 0.7
    assert quantize_keep_rate(0.87) == 0.9
    assert quantize_keep_rate(adjust_keep_rate(0, 4, 20)) == 1.0


def test_prompt_mask_selects_prompt_params():
    _, params = _model_and_params()
    mask = prompt_only_mask(params["params"])
    n_trainable = count_trainable(params["params"], mask)
    n_total = sum(p.size for p in jax.tree.leaves(params))
    # tiny model: patch_embed_prompt dominates; full ViT-B gives <1% trainable
    assert 0 < n_trainable < 0.35 * n_total
    flat = flax.traverse_util.flatten_dict(mask)
    for path, trainable in flat.items():
        assert trainable == any("prompt" in str(k) for k in path)


def test_train_step_overfits_and_freezes_backbone():
    model, params = _model_and_params()
    mask = {"params": prompt_only_mask(params["params"])}
    tx = build_optimizer(params, lr=5e-3, trainable_mask=mask)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, box_mask_z=MASK_Z, ce_keep_lens=KEEP,
                           search_size=64, stride=16, use_drop_path=False)
    step = jax.jit(step)
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    _, stats0 = step(state, batch, rng)
    for _ in range(15):
        state, stats = step(state, batch, rng)
    assert float(stats["Loss/total"]) < float(stats0["Loss/total"])
    assert np.isfinite(float(stats["Loss/total"]))

    # frozen leaves identical, prompt leaves moved
    flat0 = flax.traverse_util.flatten_dict(params["params"])
    flat1 = flax.traverse_util.flatten_dict(state.params["params"])
    moved = frozen_same = 0
    for k in flat0:
        is_prompt = any("prompt" in str(p) for p in k)
        same = np.allclose(np.asarray(flat0[k]), np.asarray(flat1[k]))
        if is_prompt and not same:
            moved += 1
        if not is_prompt:
            assert same, f"frozen param {k} changed"
            frozen_same += 1
    assert moved > 0 and frozen_same > 0


def test_sharded_train_step_on_mesh():
    model, params = _model_and_params(B=8)
    tx = build_optimizer(params, lr=1e-3)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, box_mask_z=MASK_Z, ce_keep_lens=KEEP,
                           search_size=64, stride=16, use_drop_path=False)
    mesh = make_mesh({"data": 8})
    sharded = shard_train_step(step, mesh)
    state = replicate(state, mesh)
    batch = shard_batch(_batch(B=8), mesh)
    rng = replicate(jax.random.PRNGKey(0), mesh)
    new_state, stats = sharded(state, batch, rng)
    assert np.isfinite(float(stats["Loss/total"]))
    assert int(new_state.step) == 1


def test_sharded_matches_single_device_grads():
    """DP over the mesh must produce the same update as one big batch."""
    model, params = _model_and_params(B=8)
    tx = build_optimizer(params, lr=1e-3)
    step = make_train_step(model, tx, box_mask_z=MASK_Z, ce_keep_lens=KEEP,
                           search_size=64, stride=16, use_drop_path=False)
    batch = _batch(B=8)
    rng = jax.random.PRNGKey(0)

    s_single = TrainState.create(params, tx)
    s_single, stats_single = jax.jit(step)(s_single, batch, rng)

    mesh = make_mesh({"data": 8})
    s_mesh = replicate(TrainState.create(params, tx), mesh)
    s_mesh, stats_mesh = shard_train_step(step, mesh)(
        s_mesh, shard_batch(batch, mesh), replicate(rng, mesh))

    np.testing.assert_allclose(float(stats_single["Loss/total"]),
                               float(stats_mesh["Loss/total"]), rtol=2e-5)
    a = jax.tree.leaves(s_single.params)[0]
    b = jax.tree.leaves(s_mesh.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_batched_tracker_matches_single():
    rt = ViPTRuntime(template_size=32, search_size=64, stride=16,
                     ce_loc=(1,), ce_keep_ratio=(0.7,))
    model, params = _model_and_params(B=1)
    frames, gt = make_synthetic_sequence(n_frames=4, height=96, width=128)
    frames2, gt2 = make_synthetic_sequence(n_frames=4, height=96, width=128,
                                           seed=7, box0=(40.0, 30.0, 30.0, 24.0))
    single = []
    for f, g0 in ((frames, gt[0]), (frames2, gt2[0])):
        t = ViPTTracker(model, params, rt)
        t.initialize(f[0], {"init_bbox": g0.tolist()})
        single.append([t.track(f[i])["target_bbox"] for i in range(1, 4)])
    single = np.asarray(single)  # (2, 3, 4)

    bt = BatchedViPTTracker(model, params, rt)
    bt.initialize(np.stack([frames[0], frames2[0]]), np.stack([gt[0], gt2[0]]))
    batched = np.stack([bt.track(np.stack([frames[i], frames2[i]]))[0]
                        for i in range(1, 4)])  # (3, 2, 4)
    np.testing.assert_allclose(batched.transpose(1, 0, 2), single, atol=1e-3)


def test_process_local_slice_single_host():
    s = process_local_slice(10)
    assert s == slice(0, 10)


def test_train_cli_script_surface():
    """tools/train.py exposes every family's training entry (reference
    run_training parity); catches dispatch/sizes wiring typos without
    running the heavy pipelines."""
    import ast
    import os

    src = open(os.path.join(os.path.dirname(__file__), "..", "tools",
                            "train.py")).read()
    tree = ast.parse(src)
    choices = None
    for node in ast.walk(tree):
        if (isinstance(node, ast.keyword) and node.arg == "choices"
                and isinstance(node.value, ast.List)):
            vals = [c.value for c in node.value.elts
                    if isinstance(c, ast.Constant)]
            if "vipt" in vals:
                choices = vals
    assert choices is not None
    for script in ("vipt", "ostrack", "dimp", "det_dimp", "stark",
                   "mixformer", "siamfc", "mdnet", "apfnet",
                   "kys", "lwl", "lwl_box"):
        assert script in choices, script
    # the per-family geometry table must cover every zoo script
    for script in ("kys", "lwl", "lwl_box"):
        assert f'"{script}": dict(' in src, script
