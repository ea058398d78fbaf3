"""Split production per-batch cost: host dispatch vs device execution.

Times N extend_async dispatches back-to-back (no materialize) then the one
materialize barrier — if dispatch-side dominates, the engine is host-bound
and needs overlap/trimming; if materialize dominates, it's device prep.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    src = open(os.path.join(os.path.dirname(__file__), "..", "bench.py")).read()
    ns: dict = {"np": np, "time": time, "json": __import__("json")}
    exec(src.split("def main()")[0], ns)
    make_batch = ns["make_batch"]

    from phasm_tpu.overlap.engine import OverlapConfig, _resolve_backend
    from phasm_tpu.overlap.extend import DeviceExtender, _enable_compilation_cache

    _enable_compilation_cache()
    W, JMAX, M = 64, 2048, 65536
    rng = np.random.default_rng(0)
    print("building batch...", flush=True)
    oriented, lengths, a_oid, b_oid, d0 = make_batch(rng, 512, 4096, M, JMAX)
    print("batch ready", flush=True)
    ext = DeviceExtender(
        oriented, lengths, band=W, backend=_resolve_backend(OverlapConfig())
    )
    d0 = d0.astype(np.int32)
    t0 = time.time()
    out, Mm = ext.extend_async(a_oid, b_oid, d0, JMAX)
    print(f"first dispatch (compile/deser): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    ext.materialize(out, Mm)
    print(f"first materialize (D2H init): {time.time()-t0:.1f}s", flush=True)
    ts = []
    last = None
    t_all0 = time.time()
    for _ in range(10):
        t1 = time.time()
        last = ext.extend_async(a_oid, b_oid, d0, JMAX)
        ts.append(time.time() - t1)
    t_disp = time.time() - t_all0
    t0 = time.time()
    ext.materialize(last[0], last[1])
    t_mat = time.time() - t0
    print("dispatch-side per call (ms):", [f"{x*1e3:.1f}" for x in ts])
    print(f"total dispatch {t_disp*1e3:.0f} ms for 10; "
          f"final materialize {t_mat*1e3:.0f} ms")
    print(f"=> per-batch wall {(t_disp+t_mat)/10*1e3:.1f} ms "
          f"vs kernel-only ~16.9 ms at 64k")


if __name__ == "__main__":
    main()
