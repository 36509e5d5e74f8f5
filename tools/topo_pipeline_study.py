"""Topo-pipeline convergence study (round-2 VERDICT item 4).

Question: is the opt-in pipelined topological mode (`topo_pipeline=True`,
one-step-stale persistence PAIRING, loss/grads at current params —
train/trainer.py topo_step_pipelined) convergence-equivalent to the
synchronous two-phase mode, so it can become the default for
`--top` training (reference workload: per-step topo loss at
octsam/models/training_utils.py:63-64)?

Design notes (two failure modes had to be engineered around):
  1. A single paired run cannot answer this — on a stochastic non-convex
     trajectory ANY one-ulp perturbation diverges after a few epochs
     (measured here: at lr 1e-2 sync-vs-pipelined train losses differed
     by up to 30% by epoch 9 while the PIPELINED run ended better —
     chaos, not harm). So the comparison is distributional over seeds.
  2. The tiny model sits on an all-positive plateau for its first ~50
     epochs (measured in the round-3 Dice-parity work,
     tests/test_train_step_parity.py), where Dice is noise. So each seed
     first WARMS past the plateau without the topological term, then
     BRANCHES into sync-vs-pipelined topo training from the identical
     checkpoint (params + Adam state + epoch, via the trainer's resume
     path) — the branch delta isolates the one-step-stale pairing.

Run on the CPU backend (deterministic, no tunnel):
    JAX_PLATFORMS=cpu python tools/topo_pipeline_study.py \
        [--warm_epochs 60] [--branch_epochs 20] [--seeds 2]

Results are recorded in BASELINE.md ("topo_pipeline study").
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(root, n=16, hw=(64, 96), classes=4, seed=0):
    from dilabhelmholtzoct_tpu.data.store import split_and_save

    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, size=(n, *hw, 3), dtype=np.uint8)
    labels = np.zeros((n, *hw), np.uint8)
    for i in range(n):
        for c in range(1, classes):
            # two blobs per class: H0 structure for the persistence pairing
            for _ in range(2):
                y = int(rng.integers(5, hw[0] - 20))
                x = int(rng.integers(5, hw[1] - 25))
                labels[i, y:y + 12, x:x + 15] = c
    _, save_dir = split_and_save(
        images, labels, os.path.join(root, "processed"),
        test_size=0.25, shuffle=True, seed=0,
    )
    return save_dir


def base_config(data_dir, root, name, seed, lr, epochs, **kw):
    from dilabhelmholtzoct_tpu.train.trainer import TrainConfig

    defaults = dict(
        base_model="tiny-study",
        dataset=data_dir,
        checkpoint=os.path.join(root, name),
        learning_rate=lr,
        epochs=epochs,
        batch_size=2,
        shuffle=True,
        seed=seed,
        evaluate=False,
        display_mode="none",
        compute_dtype="float32",
        cache_embeddings=True,
        buckets=(4, 8, 16),
        display_name=name,
        time="t0",
        topo_interp=16,
        topo_device=False,  # this study compares the two HOST pairing
        #   modes; the on-device mode (round-5 default) is trajectory-
        #   pinned against sync in test_topo_device_mode_matches_host
        export_pt=False,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def dice_foreground(result, data_dir, num_classes=4):
    from dilabhelmholtzoct_tpu.data.pipeline import PromptedDataset
    from dilabhelmholtzoct_tpu.data.store import load_split
    from dilabhelmholtzoct_tpu.eval.harness import evaluate_metrics
    from dilabhelmholtzoct_tpu.train.trainer import TrainConfig

    ds = PromptedDataset(load_split(data_dir, "test"), seed=1)
    config = TrainConfig(
        base_model="tiny-study", dataset=data_dir, compute_dtype="float32",
        buckets=(4, 8, 16),
    )
    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        m = evaluate_metrics(
            result["params"], result["cfg"], config, ds,
            orig_hw=ds.image(0).shape[:2], num_classes=num_classes,
        )
    d = m["_global"]["dice"]
    return float(np.mean(d[1:])), [float(x) for x in d]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm_epochs", type=int, default=60)
    ap.add_argument("--branch_epochs", type=int, default=20)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--root", default="/tmp/topo_pipeline_study")
    args = ap.parse_args()

    from dilabhelmholtzoct_tpu.models.configs import register_preset, sam_tiny
    from dilabhelmholtzoct_tpu.train.trainer import training

    register_preset("tiny-study", lambda: sam_tiny(image_size=128))

    os.makedirs(args.root, exist_ok=True)
    data_dir = make_dataset(args.root)

    rows = []
    curves = {}
    total = args.warm_epochs + args.branch_epochs
    for seed in range(args.seeds):
        warm_name = f"warm{seed}"
        r_warm = training(base_config(
            data_dir, args.root, warm_name, seed, args.lr, args.warm_epochs,
        ))
        fg_w, _ = dice_foreground(r_warm, data_dir)
        print(f"[study] warm seed {seed}: valid "
              f"{r_warm['history'][-1]['valid_loss']:.4f} fg-dice {fg_w:.4f}",
              flush=True)

        for mode in ("sync", "pipelined"):
            name = f"{mode}{seed}"
            # branch: copy the warm checkpoint dir, resume with topo on
            src = r_warm["checkpoint_dir"]
            dst_root = os.path.join(args.root, name)
            dst = os.path.join(dst_root, name)
            if os.path.exists(dst_root):
                shutil.rmtree(dst_root)
            os.makedirs(dst_root)
            shutil.copytree(src, dst)
            r = training(base_config(
                data_dir, args.root, name, seed, args.lr, total,
                topological=True, topo_pipeline=(mode == "pipelined"),
                resume=True,
            ))
            fg, per_cls = dice_foreground(r, data_dir)
            rows.append({
                "mode": mode, "seed": seed,
                "warm_fg_dice": fg_w,
                "final_train": r["history"][-1]["train_loss"],
                "final_valid": r["history"][-1]["valid_loss"],
                "fg_dice": fg, "dice": per_cls,
            })
            if seed == 0:
                curves[mode] = r["history"]
            print(f"[study] {mode} seed {seed}: "
                  f"train {rows[-1]['final_train']:.4f} "
                  f"valid {rows[-1]['final_valid']:.4f} fg-dice {fg:.4f}",
                  flush=True)

    print(f"\n== branch per-epoch curves, seed 0 (lr {args.lr}, warm "
          f"{args.warm_epochs} epochs shared) ==")
    print(f"{'ep':>3} {'sync train':>12} {'pipe train':>12} "
          f"{'sync valid':>12} {'pipe valid':>12}")
    for hs, hp in zip(curves["sync"], curves["pipelined"]):
        print(f"{hs['epoch']:>3} {hs['train_loss']:>12.6f} "
              f"{hp['train_loss']:>12.6f} {hs['valid_loss']:>12.6f} "
              f"{hp['valid_loss']:>12.6f}")

    print(f"\n== final metrics over {args.seeds} seeds "
          f"({args.branch_epochs} topo epochs from shared warm start) ==")
    summary = {}
    for mode in ("sync", "pipelined"):
        sel = [r for r in rows if r["mode"] == mode]
        fv = [r["final_valid"] for r in sel]
        fd = [r["fg_dice"] for r in sel]
        summary[mode] = {
            "valid_mean": float(np.mean(fv)), "valid_std": float(np.std(fv)),
            "fg_dice_mean": float(np.mean(fd)),
            "fg_dice_std": float(np.std(fd)),
        }
        print(f"{mode:>10}: valid {np.mean(fv):.4f}±{np.std(fv):.4f}  "
              f"fg-dice {np.mean(fd):.4f}±{np.std(fd):.4f}")

    print(json.dumps({"rows": rows, "summary": summary}))


if __name__ == "__main__":
    main()
