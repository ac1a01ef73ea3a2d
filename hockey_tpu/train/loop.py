"""Training loop CLI: `python -m hockey_tpu.train.loop`.

TPU-native counterpart of the reference's `yolo task=detect mode=train`
invocation (notebooks/train_player_detection.ipynb cell 15): cosine LR,
HSV + flip augmentation, periodic checkpointing, optional (dp x fsdp)
mesh sharding. Works against a YOLO-format dataset directory or the
synthetic dataset when none is given.

Recipe notes: the default --lr 0.01 matches ultralytics SGD lr0. Earlier
rounds saw runs fall into TAL's degenerate minimum (worse boxes shrink
the task-aligned targets, which shrinks the loss — the model learns to
predict nothing). Root cause was gradients leaking through the assignment
into the soft targets; fixed with stop_gradient in losses.py. The
collapse detector below remains as a tripwire.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Train a hockey_tpu YOLOv8 detector")
    p.add_argument("--images", type=str, default=None,
                   help="images/ dir of a YOLO-format dataset (labels/ sibling); "
                        "omit to train on the synthetic dataset")
    p.add_argument("--model", type=str, default="hockey-player-detection")
    p.add_argument("--variant", type=str, default=None,
                   help="override variant (n/s/m/l/x), e.g. n for smoke tests")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--out", type=str, default="checkpoints/model.msgpack")
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--dp", type=int, default=0, help="data-parallel ways (0 = all devices)")
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--mosaic", type=float, default=0.0,
                   help="mosaic probability (ultralytics recipe: 1.0)")
    p.add_argument("--mixup", type=float, default=0.0,
                   help="mixup probability (ultralytics recipe: 0.15)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset", type=str, default="auto",
                   choices=["auto", "hard", "hard-puck", "synthetic"],
                   help="synthetic source when --images is absent: 'hard' "
                        "= broadcast-like scenes (train/scenes.py), "
                        "'hard-puck' = puck-labeled scenes")
    p.add_argument("--pool", type=int, default=2000,
                   help="pre-rendered scene pool size (hard datasets)")
    p.add_argument("--domain-rand", action="store_true",
                   help="widen the hard-scene rendering family "
                        "(scenes.sample_style) for sim2real robustness; "
                        "the held-out val pool stays legacy-style")
    p.add_argument("--val-every", type=int, default=0,
                   help="evaluate mAP on held-out scenes every N steps and "
                        "keep the best checkpoint")
    p.add_argument("--val-size", type=int, default=150)
    p.add_argument("--ema", type=float, default=0.0,
                   help="EMA decay for eval/checkpoint weights (e.g. 0.999)")
    p.add_argument("--init", type=str, default=None,
                   help="initialize from an existing checkpoint")
    p.add_argument("--box-prior", type=float, default=0.0,
                   help="init the DFL reg-head bias toward this extent "
                        "(grid units/side). Use ~1.0 for tiny-object "
                        "models (puck) so cold-start IoUs are learnable; "
                        "0 = standard init")
    p.add_argument("--precise-bn", type=int, default=8,
                   help="recalibrate BN running stats over N clean batches "
                        "before every val/checkpoint (0 = off). Running "
                        "stats EMA'd under heavy augmentation go stale; "
                        "without this a good train-mode model can eval "
                        "dead (mAP 0)")
    p.add_argument("--device-data", action="store_true",
                   help="stage the scene pool in HBM and run mosaic/flip/"
                        "HSV/mixup as XLA ops inside the train program "
                        "(train/device_aug.py) — zero per-step host->device "
                        "image transfer")
    args = p.parse_args(argv)

    import jax

    from ..models.checkpoint import save_params
    from ..models.yolov8 import MODEL_ZOO, YoloConfig, init_params
    from .data import SyntheticHockeyDataset, YoloDataset, batch_iterator
    from .trainer import TrainConfig, init_ema, make_optimizer, make_train_step

    cfg = MODEL_ZOO[args.model]
    if args.variant:
        cfg = YoloConfig(args.variant, cfg.num_classes, cfg.num_keypoints)
    tc = TrainConfig(imgsz=args.imgsz, learning_rate=args.lr,
                     warmup_steps=args.warmup, total_steps=args.steps)
    if args.init:
        from ..models.checkpoint import load_params

        params = load_params(args.init)
        print(f"initialized from {args.init}")
    else:
        params = init_params(cfg, seed=args.seed, box_prior=args.box_prior)
    opt = make_optimizer(tc)
    opt_state = opt.init(params)

    val_dataset = None
    if args.images:
        dataset = YoloDataset(args.images, imgsz=args.imgsz)
        print(f"dataset: {len(dataset)} images from {args.images}")
    elif cfg.num_keypoints:
        from .data import SyntheticRinkDataset

        dataset = SyntheticRinkDataset(imgsz=args.imgsz, seed=args.seed,
                                       rich=args.domain_rand)
        if args.val_every:
            # held-out seed stream; rich matches training so the banked
            # best reflects the camera/style families actually trained
            # (e.g. the round-4 pinhole family), not only the sterile
            # trapezoid pool
            val_dataset = SyntheticRinkDataset(
                imgsz=args.imgsz, seed=args.seed + 7777,
                rich=args.domain_rand)
        print("dataset: synthetic rink views (pose model, no --images, "
              f"rich={args.domain_rand})")
    elif args.dataset in ("hard", "hard-puck") or (
            args.dataset == "auto" and args.val_every):
        from .scenes import HardSyntheticHockeyDataset

        pucks = args.dataset == "hard-puck"
        dataset = HardSyntheticHockeyDataset(
            imgsz=args.imgsz, seed=args.seed, pool_size=args.pool,
            pucks=pucks, domain_rand=args.domain_rand)
        # held-out split: disjoint seed space, legacy style. Comparable
        # within a renderer version only: the round-3 hard negatives
        # changed legacy renders too, so cross-round comparisons require
        # re-scoring old checkpoints on the current renderer (which the
        # round-3 tables did)
        val_dataset = HardSyntheticHockeyDataset(
            imgsz=args.imgsz, seed=args.seed + 7777,
            pool_size=args.val_size, pucks=pucks)
        print(f"dataset: hard synthetic scenes (pool {args.pool}, "
              f"pucks={pucks}, domain_rand={args.domain_rand}); "
              "pre-rendering...")
        import time as _t

        t = _t.time()
        from .scenes import RENDERER_VERSION

        cache = (f"/tmp/hockey_scenes_v{RENDERER_VERSION}_"
                 f"{args.imgsz}_{args.pool}_"
                 f"{args.seed}_{int(pucks)}"
                 f"{'_dr' if args.domain_rand else ''}.npz")
        if dataset.load_cache(cache):
            print(f"loaded scene pool from {cache}")
        else:
            dataset.pregenerate()
            dataset.save_cache(cache)
        val_dataset.pregenerate()
        print(f"pre-rendered {args.pool}+{args.val_size} scenes "
              f"in {_t.time() - t:.0f}s")
    else:
        dataset = SyntheticHockeyDataset(imgsz=args.imgsz, seed=args.seed)
        print("dataset: synthetic (no --images given)")

    step_fn = make_train_step(cfg, tc, opt, ema_decay=args.ema)
    ema = init_ema(params) if args.ema else None

    n_dev = len(jax.devices())
    dp = args.dp or (n_dev // args.fsdp)
    # dp must divide the batch; shrink to the largest divisor that fits
    while dp > 1 and args.batch % dp != 0:
        dp -= 1
    use_mesh = dp * args.fsdp > 1 and n_dev > 1
    if use_mesh:
        from ..core.mesh import make_mesh
        from ..parallel.sharding import jit_train_step, shard_batch, shard_params

        if ema is not None:
            print("note: --ema is single-device only; disabled under a mesh")
            ema = None
            step_fn = make_train_step(cfg, tc, opt)
        mesh = make_mesh(dp * args.fsdp, dp=dp, fsdp=args.fsdp)
        print(f"mesh: {dict(mesh.shape)}")
        params = shard_params(mesh, params)
    else:
        mesh = None
        step = jax.jit(step_fn, donate_argnums=(0, 1, 2) if ema is not None
                       else (0, 1))

    evaluator = None
    if args.val_every and val_dataset is not None:
        if cfg.num_keypoints:
            from .eval import InTrainingPoseEvaluator

            evaluator = InTrainingPoseEvaluator(cfg, imgsz=args.imgsz)
        else:
            from .eval import InTrainingEvaluator

            evaluator = InTrainingEvaluator(cfg, imgsz=args.imgsz)
    best_map = -1.0

    # precise-BN: recalibrate running stats on clean train-distribution
    # images before any eval/save (single-device only; under a mesh the
    # fsdp-sharded stats fn is not worth the plumbing)
    recal = None
    if args.precise_bn and mesh is None:
        from .trainer import make_bn_stats_fn, precise_bn

        stats_fn = make_bn_stats_fn(cfg, tc.compute_dtype)
        rb = min(8, args.batch)

        def recal_batches():
            for k in range(args.precise_bn):
                idx = [(k * rb + j) % len(dataset) for j in range(rb)]
                yield np.stack([dataset.load(int(i))["images"]
                                for i in idx])

        def recal(p):
            return precise_bn(p, stats_fn, recal_batches())

    def prep_ckpt(p):
        return recal(p) if recal is not None else p

    def run_val(i, cur_params):
        nonlocal best_map
        cur_params = prep_ckpt(cur_params)
        # detection val pools are sized pool_size=val_size, so min() is a
        # no-op there; the synthetic rink dataset is virtually infinite
        # (len 1<<30) and needs the explicit cap
        m = evaluator.evaluate(cur_params, val_dataset,
                               range(min(len(val_dataset), args.val_size)))
        score_key = "pck" if "pck" in m else "mAP50"
        tag = ""
        if m[score_key] > best_map:
            best_map = m[score_key]
            save_params(args.out + ".best", cur_params)
            tag = " (best, saved)"
        if score_key == "pck":
            print(f"step {i:6d} VAL PCK@0.05 {m['pck']:.4f} "
                  f"kpt_err {m['mean_kpt_error_px']:.2f}px{tag}", flush=True)
        else:
            per_cls = " ".join(f"{k}={v:.3f}" for k, v in m.items()
                               if k.startswith("AP50_class"))
            print(f"step {i:6d} VAL mAP50 {m['mAP50']:.4f} "
                  f"mAP50-95 {m['mAP50_95']:.4f} {per_cls}{tag}", flush=True)

    if args.device_data and mesh is None:
        # device-resident pipeline: pool staged in HBM once, augmentation
        # fused into the train program; host sends only a PRNG key/step
        if cfg.num_keypoints:
            from .device_aug import make_pose_batch_fn, stage_pose_pool

            print(f"staging pose pool ({args.pool} scenes) in device "
                  "memory...")
            if args.mosaic or args.mixup:
                print("note: --mosaic/--mixup are unsupported for pose "
                      "pools; training without them")
            pool = stage_pose_pool(dataset, args.pool)
            batch_fn = make_pose_batch_fn(args.batch)
        else:
            from .device_aug import make_device_batch_fn, stage_pool

            print("staging scene pool in device memory...")
            pool = stage_pool(dataset)
            batch_fn = make_device_batch_fn(
                args.imgsz, args.batch, mosaic_prob=args.mosaic,
                mixup_prob=args.mixup)

        if ema is not None:
            def fused(params, ema, opt_state, pool, key):
                return step_fn(params, ema, opt_state, batch_fn(pool, key))
        else:
            def fused(params, opt_state, pool, key):
                return step_fn(params, opt_state, batch_fn(pool, key))
        fused_step = jax.jit(fused, donate_argnums=(0, 1, 2)
                             if ema is not None else (0, 1))
        key = jax.random.PRNGKey(args.seed)
        t0 = time.time()
        bad = 0
        collapsed = 0
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            if ema is not None:
                params, ema, opt_state, m = fused_step(
                    params, ema, opt_state, pool, sub)
            else:
                params, opt_state, m = fused_step(params, opt_state, pool, sub)
            loss = float(m["loss"])  # per-step sync (tunnel: one in flight)
            # the trainer discards non-finite updates (bf16 spike guard);
            # only a persistent streak means training is hopeless
            bad = bad + 1 if not np.isfinite(loss) else 0
            if bad >= 25:
                print("non-finite loss for 25 consecutive steps; aborting")
                return 1
            # TAL degenerate-minimum detector: box_loss ~ 0 with fg anchors
            # present means targets collapsed (model predicts nothing and the
            # task-aligned targets shrank to match) — further steps are
            # wasted; the best val checkpoint is already on disk
            collapsed = (collapsed + 1
                         if (i > 200 and np.isfinite(loss)
                             and not cfg.num_keypoints
                             and float(m["box_loss"]) < 0.02
                             and float(m["num_fg"]) > 0) else 0)
            if collapsed >= 100:
                print(f"step {i}: TAL collapse detected (box_loss ~ 0 for "
                      f"100 consecutive steps); stopping early. Restart "
                      f"from the saved best checkpoint at a lower --lr.")
                return 3
            if i % args.log_every == 0 or i == args.steps - 1:
                print(f"step {i:6d} loss {loss:8.4f} "
                      f"box {float(m['box_loss']):.4f} "
                      f"cls {float(m['cls_loss']):.4f} "
                      f"dfl {float(m['dfl_loss']):.4f} "
                      f"fg {float(m['num_fg']):.0f} "
                      f"gn {float(m.get('grad_norm', float('nan'))):.1f} "
                      f"({(time.time() - t0) / max(i, 1):.2f}s/step)",
                      flush=True)
            ckpt_params = params if ema is None else ema["params"]
            if evaluator is not None and i and i % args.val_every == 0:
                run_val(i, ckpt_params)
            if args.save_every and i and i % args.save_every == 0:
                save_params(args.out, prep_ckpt(ckpt_params))
        ckpt_params = params if ema is None else ema["params"]
        if evaluator is not None:
            run_val(args.steps, ckpt_params)
        save_params(args.out, prep_ckpt(ckpt_params))
        print(f"saved {args.out} (best val {best_map:.4f})"
              if best_map >= 0 else f"saved {args.out}")
        return 0

    t0 = time.time()
    bad = 0
    collapsed = 0
    it = batch_iterator(dataset, args.batch, args.steps, seed=args.seed,
                    mosaic_prob=args.mosaic, mixup_prob=args.mixup)
    for i, batch in enumerate(it):
        if mesh is not None:
            from ..parallel.sharding import jit_train_step, shard_batch

            batch = shard_batch(mesh, batch)
            if i == 0:
                with mesh:
                    step = jit_train_step(step_fn, mesh, params, opt_state, batch)
        if mesh is not None:
            with mesh:
                params, opt_state, m = step(params, opt_state, batch)
        elif ema is not None:
            params, ema, opt_state, m = step(params, ema, opt_state, batch)
        else:
            params, opt_state, m = step(params, opt_state, batch)
        if i % args.log_every == 0 or i == args.steps - 1:
            loss = float(m["loss"])
            print(f"step {i:6d} loss {loss:8.4f} box {float(m['box_loss']):.4f} "
                  f"cls {float(m['cls_loss']):.4f} dfl {float(m['dfl_loss']):.4f} "
                  f"fg {float(m['num_fg']):.0f} "
                  f"gn {float(m.get('grad_norm', float('nan'))):.1f} "
                  f"({(time.time() - t0) / max(i, 1):.2f}s/step)", flush=True)
            # skip-guarded updates (trainer.py): only a streak of bad
            # logged losses means training is hopeless
            bad = bad + 1 if not np.isfinite(loss) else 0
            if bad >= 3:
                print("non-finite loss persists; aborting")
                return 1
            # TAL degenerate-minimum detector (see device-data loop)
            collapsed = (collapsed + 1
                         if (i > 200 and np.isfinite(loss)
                             and not cfg.num_keypoints
                             and float(m["box_loss"]) < 0.02
                             and float(m["num_fg"]) > 0) else 0)
            if collapsed >= 5:
                print(f"step {i}: TAL collapse detected (box_loss ~ 0); "
                      f"stopping early. Restart from the saved best "
                      f"checkpoint at a lower --lr.")
                return 3
        ckpt_params = params if ema is None else ema["params"]
        if evaluator is not None and i and i % args.val_every == 0:
            run_val(i, ckpt_params)
        if args.save_every and i and i % args.save_every == 0:
            save_params(args.out, prep_ckpt(ckpt_params))
    ckpt_params = params if ema is None else ema["params"]
    if evaluator is not None:
        run_val(args.steps, ckpt_params)
    save_params(args.out, prep_ckpt(ckpt_params))
    print(f"saved {args.out} (best val {best_map:.4f})" if best_map >= 0
          else f"saved {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
