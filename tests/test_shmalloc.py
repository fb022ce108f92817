"""shmalloc LD_PRELOAD interposer (native/shmalloc.c): allocation routing
and glibc passthrough under a real python+numpy workload."""

import os
import subprocess
import sys

import pytest

from gdiet_tpu import native

SO = native.shmalloc_path()

needs_so = pytest.mark.skipif(SO is None, reason="no C compiler")


@needs_so
def test_mixed_alloc_patterns_under_preload():
    code = r"""
import numpy as np
# big allocations cross the 4 MiB mmap threshold; small ones stay glibc
big = [np.full(6 << 20, i, np.uint8) for i in range(4)]
small = [np.full(1024, i, np.uint8) for i in range(1000)]
for i, a in enumerate(big):
    assert (a == i).all()
# grow/shrink through realloc-ish paths (python lists, bytearrays)
b = bytearray(8 << 20)
b.extend(b"x" * (8 << 20))
del big[0]
big.append(np.arange(3_000_000, dtype=np.int64))
assert int(big[-1][-1]) == 2_999_999
# shared mappings actually in use
shared = sum(1 for l in open("/proc/self/maps") if " rw-s" in l)
assert shared >= 1, "no MAP_SHARED blocks — interposer inactive?"
print("OK", shared)
"""
    env = dict(os.environ, LD_PRELOAD=SO)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.startswith("OK")


@needs_so
def test_subprocess_spawn_under_preload():
    """fork+exec (subprocess) must work under the interposer."""
    env = dict(os.environ, LD_PRELOAD=SO)
    r = subprocess.run(
        [sys.executable, "-c",
         "import subprocess,sys;"
         "print(subprocess.run([sys.executable,'-c','print(42)'],"
         "capture_output=True,text=True).stdout.strip())"],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and r.stdout.strip() == "42", r.stderr[-2000:]
