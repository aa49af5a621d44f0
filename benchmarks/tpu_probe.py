"""Probe TPU backend health with a hard deadline (exit 0 = healthy).

The tunneled backend can wedge for minutes (bench.py docstring); JAX caches
a failed init per process, so each probe must be a fresh process.  Usage:

    python benchmarks/tpu_probe.py [deadline_s]   # default 60
"""

import os
import subprocess
import sys

PROBE = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.ones((256, 256), jnp.bfloat16); "
    "print(float(jax.jit(lambda a: (a @ a).sum())(x)))"
)


def main() -> int:
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    try:
        proc = subprocess.run([sys.executable, "-c", PROBE],
                              capture_output=True, text=True,
                              timeout=deadline)
    except subprocess.TimeoutExpired:
        print("probe: HUNG (deadline %.0fs)" % deadline)
        return 2
    if proc.returncode == 0:
        print("probe: ok")
        return 0
    tail = (proc.stderr or "").strip().splitlines()[-3:]
    print("probe: rc=%d %s" % (proc.returncode, " | ".join(tail)))
    return 1


if __name__ == "__main__":
    sys.exit(main())
