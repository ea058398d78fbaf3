"""Headline benchmark: overlap alignments/sec/chip (banded extension kernel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is 1.0 by definition — the reference (AbeelLab/phasm) publishes
no throughput numbers (BASELINE.md: "published": {}), so this bench IS the
baseline series the driver tracks across rounds.

Runs the Pallas kernel on TPU (jnp scan path elsewhere), on synthetic noisy
overlap pairs shaped like the E. coli config (4 kb mean overlaps, ~10%
pairwise divergence).  Measures steady-state device throughput with
device-resident inputs (the production engine streams batches, amortizing
host transfer; see phasm_tpu/overlap/engine.py).

Tunnel survival (the round-1 run died in jax.device_put):
  * the persistent XLA compile cache is enabled BEFORE any jit — warm runs
    skip the 1-4 min remote compile entirely;
  * operands ship as uint8 in <=8 MB chunks (the tunnel drops large
    transfers; int32 was 4x the traffic) and are cast to int32 on device;
  * every device interaction (upload chunk, compile/warm call, timed run,
    result fetch) retries independently on transient tunnel errors with
    5/15/45 s backoff instead of re-running all of main() once.
"""
import json
import time

import numpy as np

_TRANSIENT = ("FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE_EXCEEDED",
              "ABORTED", "Socket closed", "Connection reset")


def _is_transient(e: Exception) -> bool:
    s = repr(e)
    return any(t in s for t in _TRANSIENT)


def robust(fn, what="device call", attempts=4, delays=(5, 15, 45)):
    """Retry fn() on transient tunnel errors; re-raise real bugs at once."""
    for k in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered by _is_transient
            if k == attempts - 1 or not _is_transient(e):
                raise
            import sys

            print(f"# retry {what} ({k + 1}/{attempts - 1}): {type(e).__name__}",
                  file=sys.stderr)
            time.sleep(delays[min(k, len(delays) - 1)])


def put_chunked(x: np.ndarray, max_bytes: int = 8 << 20):
    """device_put in <=max_bytes chunks along the last axis, each retried."""
    import jax
    import jax.numpy as jnp

    n = x.shape[-1]
    per_col = max(1, x.nbytes // n)
    cols = max(1, max_bytes // per_col)
    parts = []
    for s in range(0, n, cols):
        c = np.ascontiguousarray(x[..., s : s + cols])
        parts.append(robust(lambda c=c: jax.device_put(c), "upload chunk"))
    if len(parts) == 1:
        return parts[0]
    return robust(lambda: jnp.concatenate(parts, axis=-1), "device concat")


def make_batch(rng, n_reads, read_len, n_pairs, jmax, err=0.05):
    """Dovetail pairs whose alignment COMPLETES within the jmax window.

    Round 1 sampled any pair within read_len-500 bp, so most pairs needed
    ~read_len columns but the kernel ran jmax=2048 — they hit no endpoint
    and returned BIG ("no alignment"), i.e. the bench was timing a workload
    whose alignments mostly don't finish.  Keep only pairs with
    read_len - d0 + slack <= jmax so every pair ends at i == la in-window.
    """
    genome = rng.integers(0, 4, 400_000).astype(np.uint8)
    pos = rng.integers(0, genome.shape[0] - read_len, n_reads)
    codes = np.stack([genome[p : p + read_len] for p in pos])
    noise = rng.random(codes.shape) < err
    codes = np.where(
        noise, (codes + rng.integers(1, 4, codes.shape)) % 4, codes
    ).astype(np.uint8)
    lengths = np.full(n_reads, read_len, dtype=np.int32)

    d_min = max(read_len - jmax + 300, 0)
    order = np.argsort(pos, kind="stable")
    a_idx, b_idx, d0 = [], [], []
    i = 0
    while len(a_idx) < n_pairs:
        step = (i // (n_reads - 1)) % 8 + 1  # vary rank distance per pass
        xi = i % (n_reads - step)
        x = order[xi]
        y = order[xi + step]
        i += 1
        if pos[y] < pos[x]:
            x, y = y, x
        if d_min <= pos[y] - pos[x] < read_len - 500:
            a_idx.append(x)
            b_idx.append(y)
            d0.append(pos[y] - pos[x])
    a_oid = 2 * np.array(a_idx[:n_pairs])
    b_oid = 2 * np.array(b_idx[:n_pairs])
    d0 = np.array(d0[:n_pairs], dtype=np.int32)

    oriented = np.zeros((2 * n_reads, read_len), dtype=np.uint8)
    oriented[0::2] = codes
    for r in range(n_reads):
        oriented[2 * r + 1] = 3 - codes[r][::-1]
    return oriented, lengths, a_oid, b_oid, d0


def main():
    import jax

    from phasm_tpu.overlap.extend import (
        _enable_compilation_cache,
        prepare_pair_tensors,
    )

    _enable_compilation_cache()  # BEFORE any jit: warm runs skip remote compiles
    backend = jax.default_backend()

    W = 64
    if backend == "tpu":
        # large batch amortizes the per-call dispatch overhead (~5 ms through
        # the axon tunnel); production engine batches the same way
        JMAX, M, iters = 2048, 16384, 20
        READ_LEN, N_READS = 4096, 512
    else:
        JMAX, M, iters = 1024, 256, 3
        READ_LEN, N_READS = 1200, 1024

    rng = np.random.default_rng(0)
    oriented, lengths, a_oid, b_oid, d0 = make_batch(
        rng, N_READS, READ_LEN, M, JMAX
    )
    a2, b2, la, lb = prepare_pair_tensors(
        oriented, lengths, a_oid, b_oid, d0, W, JMAX
    )

    if backend == "tpu":
        import jax.numpy as jnp

        from phasm_tpu.overlap.extend import _make_pallas_extend

        kernel_run = _make_pallas_extend(W, JMAX, 128, False)

        @jax.jit
        def run(d0d, lad, lbd, a2T_u8, b2T_u8):
            # cast on device: uint8 over the tunnel is 4x less traffic
            return kernel_run(
                d0d, lad, lbd,
                a2T_u8.astype(jnp.int32), b2T_u8.astype(jnp.int32),
            )

        small = [
            robust(lambda x=x: jax.device_put(x), "upload scalar vec")
            for x in (
                d0.astype(np.int32)[None, :],
                la.astype(np.int32)[None, :],
                lb.astype(np.int32)[None, :],
            )
        ]
        a2T = put_chunked(np.ascontiguousarray(a2.T))  # [JMAX+W, M] uint8
        b2T = put_chunked(np.ascontiguousarray(b2.T))  # [JMAX, M] uint8
        args = [*small, a2T, b2T]

        # warm: compile (persistent-cached) + one full execution.  NOTE:
        # jax.block_until_ready does NOT synchronize through the axon tunnel
        # (measured: a 37 ms kernel "completed" in 0.05 ms) — only an actual
        # fetch (np.asarray) is a reliable barrier, so every sync below is a
        # fetch of the [4, M] result (256 KB; its tunnel cost is why iters is
        # high — it amortizes to ~1% of the loop).
        warm = robust(lambda: run(*args), "compile+warm", delays=(10, 30, 60))
        warm_np = robust(lambda: np.asarray(warm), "warm sync")
        n_found = int((warm_np[0] < (1 << 15)).sum())
        assert n_found > 0.95 * M, (
            f"bench workload broken: only {n_found}/{M} pairs aligned"
        )

        def timed():
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = run(*args)
            np.asarray(out)  # real barrier (see note above)
            return (time.time() - t0) / iters

        dt = robust(timed, "timed loop")

        # Myers bit-vector kernels (overlap/myers_pallas.py) on the same
        # workload, same pre-marshaled-operand methodology: operands (peq /
        # packed-b, fwd + start-recovery reverse) are built on device once
        # outside the loop, exactly like a2T/b2T above; the timed loop runs
        # both kernels (the full per-pair compute).  Headline = the faster
        # backend; the slower one goes to stderr.
        dt_myers = None
        try:
            dt_myers = _myers_kernel_only(
                oriented, lengths, a_oid, b_oid, d0, W, JMAX, iters
            )
        except Exception as e:  # noqa: BLE001 — bench must survive
            import sys

            print(f"# myers kernel-only path failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
        kernel = "pallas"
        if dt_myers is not None:
            import sys

            print(f"# pallas cell-per-lane: {M / dt:,.0f} aligns/s; "
                  f"myers bit-vector: {M / dt_myers:,.0f} aligns/s",
                  file=sys.stderr)
            if dt_myers < dt:
                dt, kernel = dt_myers, "myers"
    else:
        from phasm_tpu.overlap.extend import _get_jit_batch

        runj = _get_jit_batch()
        args = [jax.device_put(x) for x in (a2, b2, la, lb, d0.astype(np.int32))]
        np.asarray(runj(*args, band=W)[0])
        t0 = time.time()
        for _ in range(iters):
            out = runj(*args, band=W)
        np.asarray(out[0])
        dt = (time.time() - t0) / iters

    aps = M / dt
    print(
        json.dumps(
            {
                "metric": f"overlap_alignments_per_sec_per_chip[{backend},band{W},j{JMAX}]",
                "value": round(aps, 1),
                "unit": "alignments/s/chip",
                "vs_baseline": 1.0,
            }
        )
    )


def _watchdog_parent():
    """Run the measurement in a killable child with a hard deadline.

    The axon tunnel can HANG without raising (observed: backend init stuck
    >13 min) — no in-process retry can recover that, only killing the
    process and starting over.  The child is this same file with
    _PHASM_BENCH_CHILD=1; the parent forwards its one JSON line."""
    import os
    import subprocess
    import sys

    env = {**os.environ, "_PHASM_BENCH_CHILD": "1"}
    for attempt in range(3):
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=800,
            )
        except subprocess.TimeoutExpired:
            print(f"# attempt {attempt + 1}: child hung >800s, killed",
                  file=sys.stderr)
            time.sleep(30 * (attempt + 1))
            continue
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if p.returncode == 0 and lines:
            print(lines[-1])
            return 0
        sys.stderr.write(p.stderr[-2000:])
        print(f"# attempt {attempt + 1}: child rc={p.returncode}",
              file=sys.stderr)
        time.sleep(30 * (attempt + 1))
    return 1


if __name__ == "__main__":
    import os
    import sys

    if os.environ.get("_PHASM_BENCH_CHILD") == "1":
        main()  # per-call transient retries live inside (robust())
    else:
        sys.exit(_watchdog_parent())
