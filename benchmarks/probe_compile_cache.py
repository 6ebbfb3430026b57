"""Measured proof: does the JAX persistent compilation cache survive
processes on this harness's relay backend?

ROADMAP round-2 noted the cache "does not appear to survive across
processes" without evidence.  This probe compiles a uniquely-shaped program
(shape salted with the current time so no earlier run can have cached it)
in subprocess A, then compiles the IDENTICAL program in subprocess B, both
with jax_compilation_cache_dir set.  If the cache works cross-process, B's
compile time collapses to cache-hit cost.

Run: python benchmarks/probe_compile_cache.py      (TPU)
Writes benchmarks/COMPILE_CACHE_PROBE.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time, json
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[2])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

n = int(sys.argv[1])  # time-salted unique inner dim
x = jnp.asarray(np.random.default_rng(0).standard_normal((8, n)).astype(np.float32))
w = jnp.asarray(np.random.default_rng(1).standard_normal((n, 128)).astype(np.float32))

def f(x, w):
    return jnp.tanh(x @ w).sum()

t0 = time.time()
lowered = jax.jit(f).lower(x, w)
compiled = lowered.compile()
t1 = time.time()
# On the axon relay, .compile() can return before the device program is
# actually built — time through the FIRST EXECUTED VALUE as well, which is
# where a deferred compile would land.
float(compiled(x, w))
t2 = time.time()
float(compiled(x + 1.0, w))
t3 = time.time()
print(json.dumps({"compile_s": round(t1 - t0, 2),
                  "first_exec_s": round(t2 - t1, 2),
                  "second_exec_s": round(t3 - t2, 2)}))
"""


def run_child(n, cache_dir):
    proc = subprocess.run([sys.executable, "-c", CHILD, str(n), cache_dir],
                          capture_output=True, text=True, timeout=1800)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main():
    cache_dir = "/root/.cache/jax_comp_probe"
    os.makedirs(cache_dir, exist_ok=True)
    # Unique-but-aligned inner dim: no prior process can have cached it.
    n = 256 + 128 * (int(time.time()) % 997)
    print(f"salted inner dim: {n}", file=sys.stderr)

    before = set(os.listdir(cache_dir))  # the dir is reused across probe runs
    a = run_child(n, cache_dir)
    entries = len(set(os.listdir(cache_dir)) - before)
    b = run_child(n, cache_dir)
    a_total = a["compile_s"] + a["first_exec_s"]
    b_total = b["compile_s"] + b["first_exec_s"]
    result = {
        "salted_dim": n,
        "first_process": a,
        "cache_entries_added_by_first": entries,
        "second_process": b,
        "first_process_compile_plus_first_exec_s": round(a_total, 2),
        "second_process_compile_plus_first_exec_s": round(b_total, 2),
        "cache_survives_processes": bool(b_total < 0.5 * a_total),
    }
    with open(os.path.join(REPO, "benchmarks", "COMPILE_CACHE_PROBE.json"),
              "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
