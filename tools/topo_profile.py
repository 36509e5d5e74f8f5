"""Host-side breakdown of the pipelined topological step on real hardware.

The topo e2e epoch is host-bound (docs/ROADMAP.md); this tool measures
WHERE the host time goes per step, on the same synthetic 552-image dataset
bench_e2e uses: device_get blocking (tunnel), persistence pairing
(union-find), Wasserstein matching, pairing device_put, dispatch overhead.
Run: python tools/topo_profile.py [--steps 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--root", default="/tmp/dhoct_e2e")
    ap.add_argument("--epochs", type=int, default=2,
                    help="epoch 1 fills the GT-diagram cache; epoch 2 is "
                    "the steady state that gets instrumented")
    args = ap.parse_args()

    from dilabhelmholtzoct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from tools.bench_e2e import build_dataset

    processed = None
    pdir = os.path.join(args.root, "data", "processed", "custom")
    if os.path.isdir(pdir):
        names = sorted(os.listdir(pdir))
        if names:
            processed = os.path.join(pdir, names[-1])
    if processed is None:
        processed = build_dataset(args.root, n=552)

    # --- instrument the host-side pieces -----------------------------------
    import jax

    from dilabhelmholtzoct_tpu.ops import topology as topo_mod

    acc: dict[str, list] = {}

    def timed(name, fn):
        def wrapper(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            acc.setdefault(name, []).append(time.perf_counter() - t0)
            return out

        return wrapper

    topo_mod.host_pairing = timed("host_pairing", topo_mod.host_pairing)
    real_get = jax.device_get
    jax.device_get = timed("device_get", real_get)
    real_put = jax.device_put
    jax.device_put = timed("device_put", real_put)

    from dilabhelmholtzoct_tpu.train import trainer as trainer_mod

    # per-step wall around the step callable
    step_walls: list[float] = []
    orig_make = trainer_mod.make_train_step

    def make_and_wrap(*a, **k):
        step = orig_make(*a, **k)

        def wrapped(*sa, **sk):
            t0 = time.perf_counter()
            out = step(*sa, **sk)
            step_walls.append(time.perf_counter() - t0)
            return out

        for attr in ("flush", "set_host_batch"):
            if hasattr(step, attr):
                setattr(wrapped, attr, getattr(step, attr))
        return wrapped

    trainer_mod.make_train_step = make_and_wrap

    config = trainer_mod.TrainConfig(
        dataset=processed,
        checkpoint=os.path.join(args.root, "ckpt_prof"),
        epochs=args.epochs,
        batch_size=args.bs,
        learning_rate=1e-3,
        compute_dtype="bfloat16",
        cache_embeddings=True,
        encoder_microbatch=8,
        evaluate=False,
        display_mode="none",
        shuffle=True,
        display_name="topo-prof",
        topological=True,
        topo_pipeline=True,
        topo_device=False,  # this tool profiles the HOST pipelined
        #   protocol; the on-device mode (the round-5 default) is profiled
        #   by tools/profile_device.py / tools/bench_topo_device.py
    )
    t0 = time.time()
    result = trainer_mod.training(config)
    total = time.time() - t0

    hist = result["history"]
    print(f"\n== topo_profile: {args.epochs} epochs, total {total:.1f}s ==")
    for e in hist:
        print(f"  epoch {e['epoch']}: {e['seconds']:.2f}s "
              f"loss {e['train_loss']:.4f}")
    n_steps = len(step_walls)
    print(f"steps timed: {n_steps}; per-step wall p50 "
          f"{1e3 * np.median(step_walls):.1f} ms "
          f"(mean {1e3 * np.mean(step_walls):.1f})")
    for name, vals in acc.items():
        v = np.asarray(vals)
        print(f"  {name:14s} n={len(v):4d}  total {v.sum():7.2f}s  "
              f"p50 {1e3 * np.median(v):6.1f} ms  "
              f"mean {1e3 * v.mean():6.1f} ms  max {1e3 * v.max():7.1f} ms")

    import shutil

    shutil.rmtree(os.path.join(args.root, "ckpt_prof"), ignore_errors=True)


if __name__ == "__main__":
    main()
