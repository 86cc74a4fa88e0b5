"""Training-throughput benchmark (reference harness: run.py:14-38 times
eval forwards; the reference has no train-side bench — this is ours).

Measures optimizer steps/sec and train rays/sec on the current default
JAX device for a grid of steps_per_dispatch values, using the synthetic
dataset generator so no licensed data is needed.

Run on the real TPU from the repo root:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_train.py
Force CPU with --cpu.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-rand", type=int, default=1024)
    ap.add_argument("--n-samples", type=int, default=64)
    ap.add_argument("--k", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--iters", type=int, default=32,
                    help="measured optimizer steps per K (after warmup)")
    ap.add_argument("--no-store", action="store_true",
                    help="stream full batches per step instead of the "
                         "device-resident frame store")
    ap.add_argument("--opts", nargs="*", default=[],
                    help="config key/value overrides, e.g. "
                         "--opts norm_th 0.05 train_keep_frac 0.25")
    ap.add_argument("--n-verts", type=int, default=1380,
                    help="SMPL cloud size (6890 = reference scale)")
    ap.add_argument("--stage2", action="store_true",
                    help="benchmark the stage-2 animation trainer "
                         "(novel-pose blend-weight consistency) instead "
                         "of stage-1 rendering loss")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from animatable_nerf_tpu.config import load_config
    from animatable_nerf_tpu.data import generate_synthetic_dataset
    from animatable_nerf_tpu.engine import make_dataset, make_model
    from animatable_nerf_tpu.train import Trainer
    from animatable_nerf_tpu.train.trainer import collate_rays, stack_batch

    tmp = tempfile.mkdtemp(prefix="anvtpu_bench_train_")
    root = os.path.join(tmp, "human")
    # enough frames for the stage-2 window (which starts AFTER the
    # num_train_frame stage-1 frames)
    generate_synthetic_dataset(root, n_frames=8, n_verts=args.n_verts)

    cfg = load_config("configs/synthetic.yaml", opts=list(args.opts))
    for split in ("train_dataset", "test_dataset"):
        cfg[split].data_root = root
        cfg[split].ann_file = os.path.join(root, "annots.npy")
    cfg.N_rand = args.n_rand
    cfg.N_samples = args.n_samples

    if args.stage2:
        cfg.aninerf_animation = True
        cfg.init_aninerf = "no_pretrain"
    ds = make_dataset(cfg, "train")
    model = make_model(cfg)
    if args.stage2:
        from animatable_nerf_tpu.train.animation import AnimationTrainer

        trainer = AnimationTrainer(cfg, model)
    else:
        trainer = Trainer(cfg, model)
    store = None
    if not args.no_store:
        from animatable_nerf_tpu.train.trainer import build_frame_store

        # mirror engine.run_train: KNN-family models with train-time
        # compaction get per-frame packed distance grids in the store
        pdist_res = (
            int(cfg.get("knn_grid_res", 64))
            if (getattr(model, "knn_pass1", False)
                and float(cfg.get("train_keep_frac", 0.0)) > 0)
            else 0
        )
        store = build_frame_store(ds, pdist_res=pdist_res)
    # distinct ray batches per step: the tunnel result-caches repeat
    # calls with bit-identical args (see CLAUDE.md) and real training
    # never repeats a batch anyway
    raw = [ds[i % len(ds)] for i in range(max(args.k) * 2)]
    items = [
        collate_rays(
            it, cfg.N_rand,
            frame_slot=(store["slot_of"][int(it["frame_index"])]
                        if store is not None else None),
        )
        for it in raw
    ]
    probe = [collate_rays(raw[0], cfg.N_rand)]
    state = trainer.init_state(jax.random.PRNGKey(0), stack_batch(probe))
    key = jax.random.PRNGKey(1)

    results = {}
    for k_steps in args.k:
        # each inner step trains one frame (B=1), mirroring the
        # reference's batch_size 1; leaves are shaped (K, 1, ...)
        batches = [
            {kk: np.stack([stack_batch(
                [items[(j * k_steps + s) % len(items)]])[kk]
                for s in range(k_steps)])
             for kk in items[0]}
            for j in range(2 + -(-args.iters // k_steps))
        ]
        st = state
        # warmup: 5 dispatches — the first is the compile, and the next
        # executions of a freshly loaded executable are still slow
        # through the remote relay (measured: a 17 ms/step program reads
        # as 1200 ms/step when timed right after compile)
        for j in range(5):
            bw = batches[j % len(batches)]
            if k_steps == 1:
                st, stats = trainer.train_step(
                    st, {kk: v[0] for kk, v in bw.items()},
                    jax.random.fold_in(key, j), store=store)
            else:
                st, stats = trainer.train_steps(
                    st, bw, jax.random.fold_in(key, j), store=store)
            # host fetch, not block_until_ready: see CLAUDE.md (Pallas)
            float(np.asarray(stats["loss"]).sum())
        n_disp = -(-args.iters // k_steps)
        checksum = 0.0
        t0 = time.perf_counter()
        for j in range(n_disp):
            b = batches[j % len(batches)]
            if k_steps == 1:
                st, stats = trainer.train_step(
                    st, {kk: v[0] for kk, v in b.items()},
                    jax.random.fold_in(key, 100 + j), store=store)
            else:
                st, stats = trainer.train_steps(
                    st, b, jax.random.fold_in(key, 100 + j), store=store)
            # force a HOST fetch per rep: block_until_ready can return
            # early for programs containing Pallas calls (CLAUDE.md)
            checksum += float(np.asarray(stats["loss"]).sum())
        dt = time.perf_counter() - t0
        n_steps = n_disp * k_steps
        results[k_steps] = {
            "steps_per_sec": n_steps / dt,
            "rays_per_sec": n_steps * cfg.N_rand / dt,
            "ms_per_step": 1e3 * dt / n_steps,
            "final_loss": float(stats["loss"][-1] if k_steps > 1
                                else stats["loss"]),
        }
        r = results[k_steps]
        print(f"K={k_steps:3d}: {r['steps_per_sec']:8.2f} steps/s  "
              f"{r['rays_per_sec']:10.0f} rays/s  "
              f"{r['ms_per_step']:8.2f} ms/step  loss={r['final_loss']:.4f}",
              flush=True)

    dev = jax.devices()[0].device_kind
    print(json.dumps({"device": dev, "n_rand": cfg.N_rand,
                      "n_samples": cfg.N_samples, "results": results}))


if __name__ == "__main__":
    main()
