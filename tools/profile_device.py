"""Device-time attribution for jitted programs via the XLA profiler.

Parses the ``*.xplane.pb`` trace the axon TPU runtime produces (the tunnel's
wall timings are polluted by ~29 ms dispatch RTT; the xplane device lines are
the only trustworthy attribution — see docs/ROADMAP.md).

Usage:
    python tools/profile_device.py encoder [--batch 8] [--runs 4]
    python tools/profile_device.py step    [--batch 8]   # full train step

Prints per-op device time sorted descending, grouped by op kind.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_xplane(logdir: str, runs: int):
    """Sum XLA-op durations on the TPU device plane, averaged over runs."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    totals: dict[str, float] = collections.defaultdict(float)
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name or "device" not in plane.name.lower():
                if not re.search(r"/device:TPU:\d+$", plane.name):
                    continue
            ev_names = {i: m.name for i, m in plane.event_metadata.items()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, "?")
                    totals[name] += ev.duration_ps / 1e9 / runs  # -> ms
    return dict(totals)


def group_of(name: str) -> str:
    """Classify by the op's own name + HLO opcode, NOT operand names."""
    head = name.split(" = ")[0].lstrip("%").lower()
    m = re.search(r"=\s+\S+\s+([\w-]+)\(", name)
    opcode = m.group(1).lower() if m else ""
    if "flash" in head or opcode == "custom-call":
        return "flash/pallas"
    if opcode in ("copy", "transpose", "copy-done", "copy-start"):
        return "copy/transpose"
    if (opcode in ("convolution", "dot") or "convolution" in head
            or "gemm" in head or head.startswith("dot")):
        return "conv/matmul"
    if "reduce" in head:
        return "reduce/norm"
    if opcode == "fusion":
        return "elementwise/fusion"
    return "other"


def report(totals: dict[str, float], top: int = 25):
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    total = sum(totals.values())
    dump = os.environ.get("DHOCT_PROFILE_DUMP")
    if dump:
        with open(dump, "w") as f:
            for name, ms in items:
                f.write(f"{ms:.4f}\t{name}\n")
        print(f"[profile] full op dump -> {dump}", file=sys.stderr)
    print(f"\n== device total: {total:.2f} ms ==")
    groups: dict[str, float] = collections.defaultdict(float)
    for name, ms in items:
        groups[group_of(name)] += ms
    for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {g:<22} {ms:8.2f} ms  {100*ms/total:5.1f}%")
    print(f"\n-- top {top} ops --")
    for name, ms in items[:top]:
        print(f"  {ms:8.3f} ms  {name[:110]}")


def profile_encoder(batch: int, runs: int, dtype: str, top: int = 25,
                    tiles: str = ""):
    import jax
    import jax.numpy as jnp
    from dilabhelmholtzoct_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if tiles:
        from dilabhelmholtzoct_tpu.ops.attention import set_packed_tiles

        tq, tk, k_sub = map(int, tiles.split(","))
        set_packed_tiles(tq, tk, k_sub)
        print(f"[tiles] tq={tq} tk={tk} k_sub={k_sub}")
    from dilabhelmholtzoct_tpu.models import sam_vit_base, init_params
    from dilabhelmholtzoct_tpu.models.sam import encode_image

    cfg = sam_vit_base()
    params = init_params(jax.random.PRNGKey(0), cfg)
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    params = jax.tree.map(
        lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, params)
    pix = jax.random.normal(jax.random.PRNGKey(1),
                            (batch, 1024, 1024, 3), cdt)

    fwd = jax.jit(lambda p, x: encode_image(p, x, cfg))
    out = fwd(params, pix)
    out.block_until_ready()

    logdir = tempfile.mkdtemp(prefix="prof_encoder_")
    jax.profiler.start_trace(logdir)
    for _ in range(runs):
        out = fwd(params, pix)
    out.block_until_ready()
    jax.profiler.stop_trace()
    totals = collect_xplane(logdir, runs)
    report(totals, top=top)
    total = sum(totals.values())
    print(f"\nencoder B={batch} {dtype}: {total:.1f} ms device "
          f"-> {batch / (total / 1e3):.1f} img/s (encoder only)")


def profile_step(batch: int, runs: int, cached: bool, top: int = 40):
    """Cached-embedding (or full) decoder fine-tune train step, bs=batch."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dilabhelmholtzoct_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from dilabhelmholtzoct_tpu.models import sam_vit_base, init_params
    from dilabhelmholtzoct_tpu.train.trainer import (
        TrainConfig, _split_params, make_optimizer, make_train_step,
    )

    cfg = sam_vit_base()
    params = init_params(jax.random.PRNGKey(0), cfg)
    decoder_params, frozen_params = _split_params(params)
    rng = np.random.default_rng(0)
    orig_hw = (496, 512)
    n_prompts = 8
    comp_map = np.zeros((batch, *orig_hw), np.int32)
    prompts = np.zeros((batch, n_prompts, 4), np.float32)
    for b in range(batch):
        for c in range(n_prompts):
            y, x = int(rng.integers(10, 400)), int(rng.integers(10, 400))
            hh, ww = int(rng.integers(30, 80)), int(rng.integers(30, 80))
            comp_map[b, y:y + hh, x:x + ww] = c + 1
            prompts[b, c] = (x, y, x + ww, y + hh)
    data = {
        "prompts": jnp.asarray(prompts),
        "comp_map": jnp.asarray(comp_map),
        "channel_mask": jnp.ones((batch, n_prompts), jnp.float32),
    }
    if cached:
        g = cfg.prompt.image_embedding_size
        data["embeddings"] = jnp.asarray(
            rng.normal(size=(batch, g, g, 256)), jnp.bfloat16)
    else:
        data["image"] = jnp.asarray(
            rng.integers(0, 255, (batch, *orig_hw, 3)), jnp.uint8)
    config = TrainConfig(
        compute_dtype="bfloat16", cache_embeddings=cached,
        batch_size=batch, encoder_microbatch=batch,
    )
    optimizer = make_optimizer(config)
    dec = jax.tree_util.tree_map(jnp.copy, decoder_params)
    opt = optimizer.init(dec)
    step = make_train_step(cfg, config, optimizer, orig_hw,
                           from_embeddings=cached)
    dec, opt, loss = step(dec, opt, frozen_params, data)
    jax.block_until_ready((dec, opt, loss))

    logdir = tempfile.mkdtemp(prefix="prof_step_")
    jax.profiler.start_trace(logdir)
    for _ in range(runs):
        dec, opt, loss = step(dec, opt, frozen_params, data)
    jax.block_until_ready((dec, opt, loss))
    jax.profiler.stop_trace()
    totals = collect_xplane(logdir, runs)
    report(totals, top=top)
    total = sum(totals.values())
    tag = "cached" if cached else "full"
    print(f"\n{tag} step B={batch}: {total:.1f} ms device "
          f"-> {batch / (total / 1e3):.1f} img/s")


def profile_topostep(batch: int, runs: int, top: int = 40):
    """On-device topological cached step (topo_device=True), bs=batch.

    The same blob-shaped synthetic batch bench.py uses (the GT diagrams
    must look like real masks — a few bars — or the matcher benchmarks the
    wrong workload). Attribution targets: the pairing while_loops
    (basin propagation + Kruskal), the two lax.sorts, and the JV matcher's
    nested Dijkstra loops (ops/topology_device.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dilabhelmholtzoct_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from dilabhelmholtzoct_tpu.models import sam_vit_base, init_params
    from dilabhelmholtzoct_tpu.train.trainer import (
        TrainConfig, _split_params, make_optimizer, make_train_step,
    )

    cfg = sam_vit_base()
    params = init_params(jax.random.PRNGKey(0), cfg)
    decoder_params, frozen_params = _split_params(params)
    rng = np.random.default_rng(0)
    orig_hw = (496, 512)
    n_prompts = 8
    comp_map = np.zeros((batch, *orig_hw), np.int32)
    prompts = np.zeros((batch, n_prompts, 4), np.float32)
    for b in range(batch):
        for c in range(n_prompts):
            y = int(rng.integers(10, orig_hw[0] - 90))
            x = int(rng.integers(10, orig_hw[1] - 90))
            hh, ww = int(rng.integers(30, 80)), int(rng.integers(30, 80))
            comp_map[b, y:y + hh, x:x + ww] = c + 1
            prompts[b, c] = (x, y, x + ww, y + hh)
    g = cfg.prompt.image_embedding_size
    data = {
        "prompts": jnp.asarray(prompts),
        "comp_map": jnp.asarray(comp_map),
        "channel_mask": jnp.ones((batch, n_prompts), jnp.float32),
        "embeddings": jnp.asarray(
            rng.normal(size=(batch, g, g, 256)), jnp.bfloat16),
    }
    config = TrainConfig(
        compute_dtype="bfloat16", cache_embeddings=True, batch_size=batch,
        topological=True, topo_interp=50, topo_device=True,
    )
    optimizer = make_optimizer(config)
    dec = jax.tree_util.tree_map(jnp.copy, decoder_params)
    opt = optimizer.init(dec)
    step = make_train_step(cfg, config, optimizer, orig_hw,
                           from_embeddings=True)
    dec, opt, loss = step(dec, opt, frozen_params, data)
    jax.block_until_ready((dec, opt, loss))

    logdir = tempfile.mkdtemp(prefix="prof_topostep_")
    jax.profiler.start_trace(logdir)
    for _ in range(runs):
        dec, opt, loss = step(dec, opt, frozen_params, data)
    jax.block_until_ready((dec, opt, loss))
    jax.profiler.stop_trace()
    totals = collect_xplane(logdir, runs)
    report(totals, top=top)
    total = sum(totals.values())
    print(f"\ntopo-device cached step B={batch}: {total:.1f} ms device "
          f"-> {batch / (total / 1e3):.1f} img/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target", choices=["encoder", "step", "fullstep",
                                       "topostep"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--top", type=int, default=None,
                    help="report rows (default: 25 encoder, 40 step)")
    ap.add_argument("--tiles", default="", help="tq,tk,k_sub override")
    args = ap.parse_args()
    if args.target == "encoder":
        profile_encoder(args.batch, args.runs, args.dtype, args.top or 25,
                        args.tiles)
    elif args.target == "step":
        profile_step(args.batch, args.runs, cached=True, top=args.top or 40)
    elif args.target == "topostep":
        profile_topostep(args.batch, args.runs, top=args.top or 40)
    else:
        profile_step(args.batch, args.runs, cached=False,
                     top=args.top or 40)


if __name__ == "__main__":
    sys.exit(main())
