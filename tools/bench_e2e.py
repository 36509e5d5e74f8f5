"""End-to-end reference-workload benchmark (BASELINE.md e2e row).

Reproduces the reference's full training run at its real scale — 552
images, 496x512, 14 classes, 10-epoch mask-decoder fine-tune at batch 8
with per-epoch validation, Orbax checkpoints, and per-epoch prompt
re-jitter (octsam/models/training.py defaults, scaled to the reference's
stated dataset size, README.md:17) — on synthetic blob data through the
REAL user path: preprocessing CLI dataset on disk -> training().

Usage: python tools/bench_e2e.py [--epochs 10] [--bs 8] [--keep]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_dataset(root: str, n: int = 552, hw=(496, 512)) -> str:
    """Write a raw custom-layout dataset and preprocess it to disk."""
    from PIL import Image

    raw = os.path.join(root, "data", "raw", "custom")
    img_dir = os.path.join(raw, "imagesgreyscale")
    mask_dir = os.path.join(raw, "masks14")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    h, w = hw
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        mask = np.zeros((h, w), np.uint8)
        # OCT-like horizontal bands + a few blobs, ~6-10 components
        n_bands = int(rng.integers(3, 7))
        y = 0
        for b in range(n_bands):
            yn = y + int(rng.integers(40, 120))
            mask[y:yn] = int(rng.integers(1, 14))
            y = yn
            if y >= h:
                break
        for _ in range(int(rng.integers(1, 4))):
            cy, cx = int(rng.integers(20, h - 60)), int(rng.integers(20, w - 60))
            mask[cy:cy + 40, cx:cx + 40] = int(rng.integers(1, 14))
        Image.fromarray(img).save(os.path.join(img_dir, f"im{i:04d}.png"))
        m3 = np.stack([mask] * 3, -1)
        Image.fromarray(m3).save(os.path.join(mask_dir, f"im{i:04d}.png"))

    from dilabhelmholtzoct_tpu.data.preprocessing import main as preprocess_main

    preprocess_main([
        "--dataset", "custom",
        "--data_directory", os.path.join(root, "data"),
        "--test_size", "0.1", "--storage", "raw",
    ])
    processed = os.path.join(root, "data", "processed", "custom")
    name = sorted(os.listdir(processed))[-1]
    return os.path.join(processed, name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--n", type=int, default=552)
    ap.add_argument("--root", default="/tmp/dhoct_e2e")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--evaluate", action="store_true",
                    help="run the reference's final per-class evaluation")
    ap.add_argument("--top", action="store_true",
                    help="topological regularizer on (on-device default)")
    ap.add_argument("--topo_sync", action="store_true",
                    help="with --top: synchronous two-phase HOST mode "
                         "(implies --topo_host)")
    ap.add_argument("--topo_host", action="store_true",
                    help="with --top: host pairing protocol (pipelined "
                         "unless --topo_sync) instead of the on-device "
                         "round-5 default")
    args = ap.parse_args()

    from dilabhelmholtzoct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from dilabhelmholtzoct_tpu.train.trainer import TrainConfig, training

    processed = None
    if os.path.isdir(os.path.join(args.root, "data", "processed", "custom")):
        pdir = os.path.join(args.root, "data", "processed", "custom")
        names = sorted(os.listdir(pdir))
        if names:
            processed = os.path.join(pdir, names[-1])
            print(f"[e2e] reusing dataset {processed}")
    if processed is None:
        t0 = time.time()
        processed = build_dataset(args.root, n=args.n)
        print(f"[e2e] dataset built in {time.time() - t0:.1f}s: {processed}")

    config = TrainConfig(
        dataset=processed,
        checkpoint=os.path.join(args.root, "ckpt"),
        epochs=args.epochs,
        batch_size=args.bs,
        learning_rate=1e-3,
        compute_dtype="bfloat16",
        cache_embeddings=True,
        encoder_microbatch=8,
        evaluate=args.evaluate,
        display_mode="none",
        shuffle=True,
        display_name="e2e-bench",
        topological=args.top,
        topo_pipeline=not args.topo_sync,
        topo_device=not (args.topo_host or args.topo_sync),
    )
    t0 = time.time()
    result = training(config)
    total = time.time() - t0
    epochs = result["history"]
    steady = [e["seconds"] for e in epochs[1:]] or [epochs[0]["seconds"]]
    n_img = args.n - args.n // 10
    print(
        f"[e2e] total {total:.1f}s for {args.epochs} epochs; "
        f"steady epoch p50 {np.median(steady):.2f}s "
        f"({n_img / np.median(steady):.1f} img/s incl. validation+ckpt); "
        f"losses {epochs[0]['train_loss']:.4f} -> {epochs[-1]['train_loss']:.4f}"
    )
    if not args.keep:
        shutil.rmtree(os.path.join(args.root, "ckpt"), ignore_errors=True)


if __name__ == "__main__":
    main()
