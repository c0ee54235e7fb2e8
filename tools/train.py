"""Training entry point.

Rebuild of ViPT/tracking/train.py + lib/train/run_training.py +
train_script.py as ONE program: no torch.distributed.launch process fan-out —
multi-chip data parallelism is a jax mesh inside one process per host
(multi-host runs call jax.distributed.initialize, same script).

Usage:
  python tools/train.py --script vipt --config deep_rgbd [--save_dir ./workspace]
  python tools/train.py --script vipt --config deep_rgbt --synthetic  # smoke
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser(description="Train a tracker (TPU-native)")
    p.add_argument("--script", default="vipt",
                   choices=["vipt", "ostrack", "dimp", "det_dimp", "stark",
                            "mixformer", "siamfc", "mdnet", "apfnet",
                            "kys", "lwl", "lwl_box"])
    p.add_argument("--stage", default=None,
                   help="stark/mixformer: bbox|score; apfnet: 1|2|3 "
                        "(train_stage{1,2,3}.py)")
    p.add_argument("--attribute", type=int, default=0,
                   help="apfnet stage 1: attribute branch index (0-4)")
    p.add_argument("--config", default="deep_rgbd",
                   help="experiment name (e.g. deep_rgbd) or a YAML path")
    p.add_argument("--save_dir", default="./workspace")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--epochs", type=int, default=None, help="override cfg")
    p.add_argument("--batch", type=int, default=None, help="override cfg")
    p.add_argument("--samples", type=int, default=None,
                   help="override cfg samples per epoch (smoke runs)")
    p.add_argument("--init", default=None, metavar="ORBAX_DIR",
                   help="initialize params from a prior-stage orbax "
                        "checkpoint before training (stage-2 recipes: the "
                        "reference ST2/TRAIN_SCORE loads stage 1 first)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic data (no dataset roots needed)")
    p.add_argument("--synthetic_modality", default="both",
                   choices=["both", "rgb_only", "aux_only"],
                   help="which modality triplet carries the synthetic "
                        "target (rgb_only = RGB-foundation corpus, "
                        "aux_only = ViPT new-modality corpus)")
    p.add_argument("--synthetic_distractor", action="store_true",
                   help="synthetic corpus: add an identical-looking "
                        "crossing distractor per sequence (the KYS "
                        "propagation / KeepTrack association setting)")
    p.add_argument("--channels", type=int, default=3, choices=[3, 6],
                   help="kys/lwl/lwl_box: input channel count (3 = the "
                        "canonical RGB fork recipe; 6 = multi-modal stack, "
                        "e.g. a KYS base grafted from a trained 6-ch DiMP)")
    p.add_argument("--full_tune", action="store_true",
                   help="vipt: train ALL parameters instead of prompt-only "
                        "(foundation training, e.g. the learning demo; the "
                        "reference's OSTrack pretrain stage analog)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    args = p.parse_args()

    if args.distributed:
        jax.distributed.initialize()

    from mmtrack_tpu.utils.env import enable_compile_cache

    enable_compile_cache()  # first full train-step compile is minutes on 1 core

    from mmtrack_tpu.config import vipt_default_config, vipt_experiment_config
    from mmtrack_tpu.data.datasets import SyntheticVideoDataset, names2datasets
    from mmtrack_tpu.data.loader import BatchLoader
    from mmtrack_tpu.data.processing import from_config as processing_from_config
    from mmtrack_tpu.data.sampler import TrackingSampler
    from mmtrack_tpu.models.vipt import (build_ostrack, build_viptrack,
                                         ce_keep_schedule, generate_ctr_mask)
    from mmtrack_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from mmtrack_tpu.train.optim import build_optimizer, count_trainable, prompt_only_mask
    from mmtrack_tpu.train.train_step import TrainState, make_train_step, shard_train_step
    from mmtrack_tpu.train.trainer import CheckpointManager, Trainer
    from mmtrack_tpu.utils.env import load_env_settings
    from mmtrack_tpu.utils.logging import MetricLogger

    if os.path.exists(args.config):
        cfg = vipt_default_config()
        cfg.merge_from_yaml(args.config)
        cfg_name = os.path.splitext(os.path.basename(args.config))[0]
    else:
        cfg = vipt_experiment_config(args.config)
        cfg_name = args.config
    if args.epochs:
        cfg.TRAIN.EPOCH = args.epochs
    if args.batch:
        cfg.TRAIN.BATCH_SIZE = args.batch
    if args.samples:
        cfg.DATA.TRAIN.SAMPLE_PER_EPOCH = args.samples

    env = load_env_settings()
    save_dir = os.path.join(args.save_dir, f"{args.script}-{cfg_name}")

    # non-ViPT families build their own data pipelines — dispatch BEFORE
    # constructing the ViPT datasets/sampler (indexing large corpora twice
    # doubles startup I/O)
    dtype = jnp.bfloat16 if cfg.TRAIN.AMP else jnp.float32
    if args.script in ("dimp", "det_dimp"):
        return _train_dimp(args, cfg, dtype)
    if args.script in ("stark", "mixformer", "siamfc", "mdnet", "apfnet",
                       "kys", "lwl", "lwl_box"):
        return _train_zoo(args, cfg, dtype)

    logger = MetricLogger(os.path.join(save_dir, "logs"))

    # data
    proc = processing_from_config(cfg, train_mode=True)
    if args.synthetic:
        datasets = [SyntheticVideoDataset(
            n_sequences=8, n_frames=60, modality=args.synthetic_modality,
            distractor=args.synthetic_distractor)]
        ratios = None
    else:
        roots = {n: env.dataset_root(n) for n in cfg.DATA.TRAIN.DATASETS_NAME}
        datasets = names2datasets(cfg.DATA.TRAIN.DATASETS_NAME, roots)
        ratios = cfg.DATA.TRAIN.DATASETS_RATIO
    sampler = TrackingSampler(datasets, ratios,
                              samples_per_epoch=cfg.DATA.TRAIN.SAMPLE_PER_EPOCH,
                              max_gap=cfg.DATA.MAX_SAMPLE_INTERVAL,
                              processing=proc,
                              seed=args.seed + jax.process_index())
    loader = BatchLoader(sampler, cfg.TRAIN.BATCH_SIZE)

    # model
    if args.script == "vipt":
        model = build_viptrack(cfg, dtype=dtype)
    else:  # ostrack
        model = build_ostrack(cfg, dtype=dtype)
    keep = ce_keep_schedule((cfg.DATA.SEARCH.SIZE // cfg.MODEL.BACKBONE.STRIDE) ** 2,
                            cfg.MODEL.BACKBONE.CE_LOC,
                            cfg.MODEL.BACKBONE.CE_KEEP_RATIO)
    mask_z = generate_ctr_mask(cfg.DATA.TEMPLATE.SIZE // cfg.MODEL.BACKBONE.STRIDE,
                               cfg.MODEL.BACKBONE.CE_TEMPLATE_RANGE)

    z = jnp.zeros((1, cfg.DATA.TEMPLATE.SIZE, cfg.DATA.TEMPLATE.SIZE, 6))
    x = jnp.zeros((1, cfg.DATA.SEARCH.SIZE, cfg.DATA.SEARCH.SIZE, 6))
    params = jax.jit(lambda r: model.init(r, z, x, mask_z, keep))(
        jax.random.PRNGKey(args.seed))

    params = _maybe_init_params(args, params)

    steps_per_epoch = len(loader)
    trainable = ({"params": prompt_only_mask(params["params"])}
                 if args.script == "vipt" and not args.full_tune else None)
    if trainable is not None:
        n = count_trainable(params["params"], trainable["params"])
        print(f"prompt-only tuning: {n / 1e6:.2f}M trainable parameters")
    tx = build_optimizer(params, lr=cfg.TRAIN.LR,
                         weight_decay=cfg.TRAIN.WEIGHT_DECAY,
                         lr_drop_step=cfg.TRAIN.LR_DROP_EPOCH * steps_per_epoch,
                         decay_rate=cfg.TRAIN.SCHEDULER.DECAY_RATE,
                         grad_clip_norm=cfg.TRAIN.GRAD_CLIP_NORM,
                         trainable_mask=trainable)
    state = TrainState.create(params, tx)

    mesh = make_mesh()
    state = replicate(state, mesh)

    # CE keep-rate anneal: quantized to a static set so the epoch schedule
    # costs at most 4 recompilations (ce_utils.py:68-80 cosine -> SURVEY 7.2)
    from mmtrack_tpu.train.actor import adjust_keep_rate, quantize_keep_rate
    _step_cache: dict[float, object] = {}

    def step_for_epoch(epoch: int):
        if cfg.MODEL.BACKBONE.CE_LOC:
            rate = quantize_keep_rate(adjust_keep_rate(
                epoch, cfg.TRAIN.CE_START_EPOCH,
                cfg.TRAIN.CE_START_EPOCH + cfg.TRAIN.CE_WARM_EPOCH,
                base_keep_rate=cfg.MODEL.BACKBONE.CE_KEEP_RATIO[0]))
        else:
            rate = 1.0
        if rate not in _step_cache:
            lens = (None if rate >= 1.0 else ce_keep_schedule(
                (cfg.DATA.SEARCH.SIZE // cfg.MODEL.BACKBONE.STRIDE) ** 2,
                cfg.MODEL.BACKBONE.CE_LOC,
                [rate] * len(cfg.MODEL.BACKBONE.CE_LOC)))
            s = make_train_step(
                model, tx, box_mask_z=mask_z, ce_keep_lens=lens,
                weights=(cfg.TRAIN.GIOU_WEIGHT, cfg.TRAIN.L1_WEIGHT,
                         cfg.TRAIN.FOCAL_WEIGHT),
                search_size=cfg.DATA.SEARCH.SIZE,
                stride=cfg.MODEL.BACKBONE.STRIDE)
            sharded = shard_train_step(s, mesh)
            _step_cache[rate] = lambda st, b, r: sharded(
                st, shard_batch(b, mesh), replicate(r, mesh))
        return _step_cache[rate]

    mesh_step = step_for_epoch(1)

    ckpts = CheckpointManager(os.path.join(save_dir, "checkpoints"),
                              save_interval=cfg.TRAIN.SAVE_EPOCH_INTERVAL,
                              keep_last=max(cfg.TRAIN.SAVE_LAST_N_EPOCH, 2))
    trainer = Trainer(mesh_step, state, loader, ckpts, rng_seed=args.seed,
                      print_interval=cfg.TRAIN.PRINT_INTERVAL,
                      step_for_epoch=step_for_epoch)
    orig_epoch_fn = trainer.train_epoch

    def logged_epoch():
        stats = orig_epoch_fn()
        logger.write(trainer.epoch * steps_per_epoch, stats, epoch=trainer.epoch)
        return stats

    trainer.train_epoch = logged_epoch
    trainer.train(cfg.TRAIN.EPOCH, load_latest=True, fail_safe=True)
    print(f"done: {trainer.epoch} epochs, checkpoints in {save_dir}")


def _maybe_init_params(args, params):
    """--init: overlay a prior-stage/converted orbax checkpoint onto the
    fresh init (stage-2 recipes must not fit heads to random frozen
    features — the reference loads the stage-1 net first)."""
    if not getattr(args, "init", None):
        return params
    import orbax.checkpoint as ocp

    from mmtrack_tpu.models.convert import load_into

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(args.init))
    src = restored.get("params", restored)
    if "params" in src and "params" in params:
        src = src["params"]
    loaded, missing, unexpected = load_into(params.get("params", params), src)
    print(f"--init {args.init}: loaded; missing={len(missing)} "
          f"unexpected={len(unexpected)}")
    return {**params, "params": loaded} if "params" in params else loaded


def _train_zoo(args, cfg, dtype):
    """Offline training for the non-ViPT zoo (SPT/lib/train,
    MixFormer_RGBD/lib/train TRAIN_SCORE stage, SiamFC pair training,
    pyMDNet train_mdnet.py / APFNet train_stage{1,2,3}.py)."""
    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.data.datasets import SyntheticVideoDataset, names2datasets
    from mmtrack_tpu.data.loader import BatchLoader
    from mmtrack_tpu.data.processing import ViPTProcessing
    from mmtrack_tpu.data.sampler import TrackingSampler
    from mmtrack_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from mmtrack_tpu.train import zoo_actors
    from mmtrack_tpu.train.optim import build_optimizer
    from mmtrack_tpu.train.train_step import TrainState, shard_train_step
    from mmtrack_tpu.train.trainer import CheckpointManager, Trainer
    from mmtrack_tpu.utils.env import load_env_settings

    # per-family geometry
    sizes = {
        "stark": dict(template=128, search=320, tf=2.0, sf=5.0),
        "mixformer": dict(template=128, search=320, tf=2.0, sf=5.0),
        # serve-time exemplar is context-padded: z_sz = sqrt((w+c)(h+c)),
        # c = 0.5(w+h) -> ~2x sqrt(wh); search spans 255/127 * z_sz ~ 4x.
        # center jitter must stay inside the 17x17 response label span.
        "siamfc": dict(template=127, search=255, tf=2.0, sf=4.0),
        "mdnet": dict(template=107, search=320, tf=1.2, sf=3.0),
        "apfnet": dict(template=107, search=320, tf=1.2, sf=3.0),
        # kys: the target-centered template doubles as the PREVIOUS test
        # frame (same 288 geometry as the tracker); lwl: equal-size pair
        # for the few-shot learn-then-segment forward
        "kys": dict(template=288, search=288, tf=5.0, sf=5.0),
        "lwl": dict(template=256, search=256, tf=6.0, sf=6.0),
        "lwl_box": dict(template=256, search=256, tf=6.0, sf=6.0),
    }[args.script]
    search_jitter = 0.5 if args.script == "siamfc" else 3.0
    n_search, collate_fn, max_gap = 1, None, cfg.DATA.MAX_SAMPLE_INTERVAL
    if args.script == "kys":
        # the propagation predictor trains on REAL prev/cur search pairs
        # in serve geometry (both crops at the prev frame's jittered box,
        # no per-crop flips) — tracking_motion.py:51-78 semantics; small
        # gap so the pair's displacement matches consecutive-frame motion
        from mmtrack_tpu.data.loader import collate_pair
        from mmtrack_tpu.data.processing import KYSPairProcessing
        proc = KYSPairProcessing(search_area_factor=sizes["sf"],
                                 output_sz=sizes["search"])
        n_search, collate_fn, max_gap = 2, collate_pair, min(max_gap, 5)
    else:
        proc = ViPTProcessing(
            search_area_factor={"template": sizes["tf"],
                                "search": sizes["sf"]},
            output_sz={"template": sizes["template"],
                       "search": sizes["search"]},
            center_jitter_factor={"template": 0.0, "search": search_jitter},
            scale_jitter_factor={"template": 0.0, "search": 0.25})
    if args.synthetic:
        datasets, ratios = [SyntheticVideoDataset(
            8, 60, modality=args.synthetic_modality,
            distractor=args.synthetic_distractor)], None
    else:
        env = load_env_settings()
        roots = {n: env.dataset_root(n) for n in cfg.DATA.TRAIN.DATASETS_NAME}
        datasets = names2datasets(cfg.DATA.TRAIN.DATASETS_NAME, roots)
        ratios = cfg.DATA.TRAIN.DATASETS_RATIO
    sampler = TrackingSampler(datasets, ratios,
                              samples_per_epoch=cfg.DATA.TRAIN.SAMPLE_PER_EPOCH,
                              max_gap=max_gap, num_search_frames=n_search,
                              processing=proc, seed=args.seed)
    loader = (BatchLoader(sampler, cfg.TRAIN.BATCH_SIZE)
              if collate_fn is None else
              BatchLoader(sampler, cfg.TRAIN.BATCH_SIZE,
                          collate_fn=collate_fn))

    stage = args.stage or ("bbox" if args.script in ("stark", "mixformer")
                           else "3" if args.script == "apfnet" else "")
    trainable_mask = None

    if args.script == "stark":
        from mmtrack_tpu.models.stark import STARK
        model = STARK(six_channel=True, score_head=stage == "score", dtype=dtype)
        z = jnp.zeros((1, 128, 128, 6)); x = jnp.zeros((1, 320, 320, 6))
        params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(args.seed))
        step_builder = lambda tx: zoo_actors.make_stark_train_step(model, tx, stage)
        if stage == "score":
            # stage 2 trains only the score head (stark_st2 recipe); the
            # head's Dense layers are registered as cls_0/cls_1/cls_2
            # (models/stark.py:174)
            import flax
            flat = flax.traverse_util.flatten_dict(params["params"])
            trainable_mask = {"params": flax.traverse_util.unflatten_dict(
                {k: k[0].startswith("cls_") for k in flat})}
            assert any(k[0].startswith("cls_") for k in flat), \
                "score-head params not found; mask would freeze everything"
    elif args.script == "mixformer":
        from mmtrack_tpu.models.mixformer import build_mixformer_rgbd
        model = build_mixformer_rgbd(dtype=dtype)
        z = jnp.zeros((1, 128, 128, 6)); x = jnp.zeros((1, 320, 320, 6))
        params = jax.jit(lambda r: model.init(r, z, z, x))(jax.random.PRNGKey(args.seed))
        step_builder = lambda tx: zoo_actors.make_mixformer_train_step(model, tx, stage)
        if stage == "score":
            import flax
            flat = flax.traverse_util.flatten_dict(params["params"])
            trainable_mask = {"params": flax.traverse_util.unflatten_dict(
                {k: (k[0] == "score_branch") for k in flat})}
    elif args.script == "siamfc":
        from mmtrack_tpu.models.siamfc import SiamFC
        model = SiamFC(dtype=dtype)
        z = jnp.zeros((1, 127, 127, 6)); x = jnp.zeros((1, 255, 255, 6))
        params = jax.jit(lambda r: model.init(r, z, x))(jax.random.PRNGKey(args.seed))
        step_builder = lambda tx: zoo_actors.make_siamfc_train_step(model, tx)
    elif args.script == "kys":
        from mmtrack_tpu.models.kys import build_kysnet
        import flax
        model = build_kysnet(dtype=dtype)
        im = jnp.zeros((1, 288, 288, args.channels))
        bb = jnp.asarray([[100.0, 100.0, 80.0, 80.0]])
        props = jnp.asarray([[[100.0, 100.0, 80.0, 80.0]] * 2])
        params = jax.jit(lambda r: model.init(r, im, im, bb, props,
                                              method="init_forward"))(
            jax.random.PRNGKey(args.seed))
        # the reference trains ONLY the predictor (KYSNet.train freezes
        # the DiMP base)
        flat = flax.traverse_util.flatten_dict(params["params"])
        trainable_mask = {"params": flax.traverse_util.unflatten_dict(
            {k: k[0] == "predictor" for k in flat})}

        def step_builder(tx):
            inner = zoo_actors.make_kys_train_step(model, tx)

            def step(state, batch, rng):
                return inner(state, zoo_actors.kys_pair_adapt_batch(
                    batch, sizes["search"], sizes["tf"],
                    channels=args.channels), rng)
            return step
    elif args.script in ("lwl", "lwl_box"):
        from mmtrack_tpu.models.lwl import LWLNet
        import flax
        box_mode = args.script == "lwl_box"
        model = LWLNet(filter_size=3, num_filters=16,
                       label_encoder_dims=(16, 32, 64), optim_iter=5,
                       use_box_encoder=box_mode, dtype=dtype)
        S = sizes["search"]
        imz = jnp.zeros((1, S, S, args.channels))
        mz = jnp.zeros((1, S, S))
        if box_mode:
            def init_fn(m):
                out = m(imz, imz, mz)
                bf = m.extract_backbone(imz)
                tm = m.extract_target_model_features(bf)
                m.mask_from_box(jnp.zeros((1, 4)), tm, bf, (S, S))
                return out
            params = jax.jit(lambda r: model.init(r, method=init_fn))(
                jax.random.PRNGKey(args.seed))
            flat = flax.traverse_util.flatten_dict(params["params"])
            trainable_mask = {"params": flax.traverse_util.unflatten_dict(
                {k: k[0] == "box_label_encoder" for k in flat})}
        else:
            params = jax.jit(lambda r: model.init(r, imz, imz, mz))(
                jax.random.PRNGKey(args.seed))

        def step_builder(tx):
            inner = (zoo_actors.make_lwl_box_train_step(model, tx)
                     if box_mode else zoo_actors.make_lwl_train_step(model, tx))

            def step(state, batch, rng):
                return inner(state, zoo_actors.lwl_adapt_batch(
                    batch, S, sizes["tf"], box_mode,
                    channels=args.channels), rng)
            return step
    else:  # mdnet / apfnet
        if args.script == "apfnet":
            from mmtrack_tpu.models.apfnet import APFNet, stage_mask
            model = APFNet(dtype=dtype)
        else:
            from mmtrack_tpu.models.mdnet import MDNet
            model = MDNet(mode="dual", dtype=dtype)
        xp = jnp.zeros((1, 107, 107, 6))
        params = jax.jit(lambda r: model.init(r, xp))(jax.random.PRNGKey(args.seed))
        step_builder = lambda tx: zoo_actors.make_mdnet_train_step(model, tx)
        if args.script == "apfnet":
            # stage 1 trains one attribute branch at a time
            # (train_stage1.py loops the five attributes)
            trainable_mask = {"params": stage_mask(
                params["params"], int(stage),
                attribute=args.attribute if int(stage) == 1 else None)}

    params = _maybe_init_params(args, params)
    tx = build_optimizer(params, lr=cfg.TRAIN.LR,
                         weight_decay=cfg.TRAIN.WEIGHT_DECAY,
                         lr_drop_step=cfg.TRAIN.LR_DROP_EPOCH * len(loader),
                         grad_clip_norm=cfg.TRAIN.GRAD_CLIP_NORM,
                         trainable_mask=trainable_mask)
    state = TrainState.create(params, tx)
    step = step_builder(tx)
    mesh = make_mesh()
    sharded = shard_train_step(step, mesh)
    state = replicate(state, mesh)

    def mesh_step(st, batch, rng):
        return sharded(st, shard_batch(batch, mesh), replicate(rng, mesh))

    save_dir = os.path.join(args.save_dir, f"{args.script}-{stage or 'base'}")
    ckpts = CheckpointManager(os.path.join(save_dir, "checkpoints"),
                              save_interval=cfg.TRAIN.SAVE_EPOCH_INTERVAL)
    trainer = Trainer(mesh_step, state, loader, ckpts, rng_seed=args.seed,
                      print_interval=cfg.TRAIN.PRINT_INTERVAL)
    trainer.train(cfg.TRAIN.EPOCH, load_latest=True, fail_safe=True)
    print(f"done: {trainer.epoch} epochs, checkpoints in {save_dir}")


def _train_dimp(args, cfg, dtype):
    """DiMP-family offline training (LTR train_settings analog,
    DeT_DiMP50_Max.py): 288^2 train/test crops, IoU-MSE + LBHinge objective."""
    import jax
    import jax.numpy as jnp

    from mmtrack_tpu.data.datasets import SyntheticVideoDataset, names2datasets
    from mmtrack_tpu.data.loader import BatchLoader
    from mmtrack_tpu.data.processing import ViPTProcessing
    from mmtrack_tpu.data.sampler import TrackingSampler
    from mmtrack_tpu.models.dimp import DiMPNet
    from mmtrack_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from mmtrack_tpu.train.dimp_actor import make_dimp_train_step
    from mmtrack_tpu.train.optim import build_optimizer
    from mmtrack_tpu.train.train_step import TrainState, shard_train_step
    from mmtrack_tpu.train.trainer import CheckpointManager, Trainer
    from mmtrack_tpu.utils.env import load_env_settings

    image_sz = 288  # 18 * feat_stride (DeT_DiMP50_Max.py image_sample_size)
    proc = ViPTProcessing(
        search_area_factor={"template": 5.0, "search": 5.0},
        output_sz={"template": image_sz, "search": image_sz},
        center_jitter_factor={"template": 0.25, "search": 3.0},
        scale_jitter_factor={"template": 0.0, "search": 0.25})
    if args.synthetic:
        datasets, ratios = [SyntheticVideoDataset(
            8, 60, modality=args.synthetic_modality,
            distractor=args.synthetic_distractor)], None
    else:
        env = load_env_settings()
        roots = {n: env.dataset_root(n) for n in cfg.DATA.TRAIN.DATASETS_NAME}
        datasets = names2datasets(cfg.DATA.TRAIN.DATASETS_NAME, roots)
        ratios = cfg.DATA.TRAIN.DATASETS_RATIO
    sampler = TrackingSampler(datasets, ratios,
                              samples_per_epoch=cfg.DATA.TRAIN.SAMPLE_PER_EPOCH,
                              max_gap=cfg.DATA.MAX_SAMPLE_INTERVAL,
                              processing=proc, seed=args.seed)
    loader = BatchLoader(sampler, cfg.TRAIN.BATCH_SIZE)

    model = DiMPNet(merge_type="max" if args.script == "det_dimp" else None,
                    dtype=dtype)
    im = jnp.zeros((1, image_sz, image_sz, 6))
    bb = jnp.asarray([[100.0, 100.0, 80.0, 80.0]])
    props = jnp.asarray([[[100.0, 100.0, 80.0, 80.0]] * 8])
    params = jax.jit(lambda r: model.init(r, im, im, bb, props))(
        jax.random.PRNGKey(args.seed))
    tx = build_optimizer(params, lr=cfg.TRAIN.LR,
                         weight_decay=cfg.TRAIN.WEIGHT_DECAY,
                         lr_drop_step=cfg.TRAIN.LR_DROP_EPOCH * len(loader),
                         grad_clip_norm=cfg.TRAIN.GRAD_CLIP_NORM)
    state = TrainState.create(params, tx)
    step = make_dimp_train_step(model, tx, image_sz=image_sz)
    mesh = make_mesh()
    sharded = shard_train_step(step, mesh)
    state = replicate(state, mesh)

    def mesh_step(st, batch, rng):
        return sharded(st, shard_batch(batch, mesh), replicate(rng, mesh))

    save_dir = os.path.join(args.save_dir, f"{args.script}")
    ckpts = CheckpointManager(os.path.join(save_dir, "checkpoints"),
                              save_interval=cfg.TRAIN.SAVE_EPOCH_INTERVAL)
    trainer = Trainer(mesh_step, state, loader, ckpts, rng_seed=args.seed,
                      print_interval=cfg.TRAIN.PRINT_INTERVAL)
    trainer.train(cfg.TRAIN.EPOCH, load_latest=True, fail_safe=True)
    print(f"done: {trainer.epoch} epochs, checkpoints in {save_dir}")


if __name__ == "__main__":
    main()
