#!/usr/bin/env python
"""DP scaling artifact (VERDICT r3 #8): steps/s at 1/2/4/8 devices on
the virtual CPU mesh, fixed GLOBAL batch.

HONESTY CAVEAT (read before quoting the numbers): the container has
ONE physical CPU core and only one real TPU chip, so the virtual
devices timeshare a core — the curve can NOT show real ICI speedup.
What it DOES show is the sharded program's OVERHEAD: with a fixed
global batch the total FLOPs are constant across mesh sizes, so
steps/s staying flat means the SPMD partitioning + collectives
(gradient psum over 'data') add ~nothing to the step — i.e. on real
chips, where each shard runs on its own core, the speedup would be
governed by the per-shard work, not by framework overhead. The
numeric-parity proof (sharded loss == single-device loss, including
through a grid refresh) lives in __graft_entry__.dryrun_multichip and
tests/test_parallel.py.

Usage: python scripts/drive_dp_scaling.py  (runs all mesh sizes in
subprocesses with JAX_PLATFORMS=cpu; prints one JSON line per size)
Inner: NGP_DP_INNER=<n> python scripts/drive_dp_scaling.py
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

GLOBAL_RAYS = 4096
WARMUP = 4
TIMED = 24


def inner(n: int) -> None:
    import jax

    from ngp_tpu.parallel import make_mesh, replicate_sharding, shard_pytree

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge

    import dataclasses

    assert len(jax.devices()) >= n
    mesh = make_mesh(n) if n > 1 else None
    trainer, batch = ge._tiny_setup()
    # fixed GLOBAL batch across mesh sizes (frozen dataclass: replace)
    trainer.train_cfg = dataclasses.replace(
        trainer.train_cfg, num_rays=GLOBAL_RAYS
    )
    trainer._jit_train_step = None  # retrace at the new batch shape
    if mesh is not None:
        trainer.mesh = mesh
        repl = replicate_sharding(mesh)
        trainer.state = shard_pytree(trainer.state, repl)
        trainer.aux = shard_pytree(trainer.aux, repl)
        batch = shard_pytree(batch, repl)
    ctx = mesh if mesh is not None else _nullcontext()
    with ctx:
        for _ in range(WARMUP):
            m = trainer.step(batch)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(TIMED):
            m = trainer.step(batch)
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
        coll = _collective_inventory(trainer, batch) if n > 1 else {}
    print(json.dumps({
        "devices": n, "global_rays": GLOBAL_RAYS,
        "steps_per_s": round(TIMED / dt, 2),
        "loss": float(m["loss"]),
        **coll,
    }), flush=True)


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1}


def _collective_inventory(trainer, batch):
    """Count the collectives XLA inserted into the sharded train step
    and their payload bytes — the step's per-device communication
    volume, the quantity real-chip DP scaling is governed by."""
    import re

    import jax

    txt = (
        jax.jit(trainer.train_step, donate_argnums=(0,))
        .lower(trainer.state, trainer.aux, batch, jax.random.PRNGKey(0))
        .compile()
        .as_text()
    )
    ops = {}
    total_bytes = 0
    pat = re.compile(
        r"= (\w+)\[([0-9,]*)\]\S* "
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)\("
    )
    for dtype, dims, op in pat.findall(txt):
        nelem = 1
        for d in dims.split(","):
            if d:
                nelem *= int(d)
        b = nelem * _DTYPE_BYTES.get(dtype, 4)
        ops[op] = ops.get(op, 0) + 1
        total_bytes += b
    return {"collectives": ops, "collective_bytes": total_bytes}


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def main() -> None:
    here = os.path.abspath(__file__)
    results = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["PYTHONPATH"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n}"
        env["NGP_DP_INNER"] = str(n)
        proc = subprocess.run(
            [sys.executable, here], env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(here)),
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not line:
            print(f"n={n} FAILED:\n{proc.stderr[-1500:]}", flush=True)
            continue
        rec = json.loads(line[-1])
        results.append(rec)
        print(line[-1], flush=True)
    if results:
        base = results[0]["steps_per_s"]
        print("\n| devices | steps/s (global batch 4096 rays) | "
              "relative |", flush=True)
        print("|---|---|---|", flush=True)
        for r in results:
            print(f"| {r['devices']} | {r['steps_per_s']} | "
                  f"{r['steps_per_s']/base:.2f}x |", flush=True)


if __name__ == "__main__":
    if os.environ.get("NGP_DP_INNER"):
        inner(int(os.environ["NGP_DP_INNER"]))
    else:
        main()
