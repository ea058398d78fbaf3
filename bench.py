"""Headline benchmark: overlap alignments/sec/chip through the PRODUCTION
path (DeviceExtender.extend_async + materialize — the code overlap_reads
actually runs, including on-device window construction and result fetch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is 1.0 by definition — the reference (AbeelLab/phasm) publishes
no throughput numbers (BASELINE.md: "published": {}), so this bench IS the
baseline series the driver tracks across rounds.  Round 1-2 benched the
kernel with pre-marshaled operands; per VERDICT r2 weak #1 the tracked
series is now the number users get (kernel-only rates go to stderr for
roofline tracking).

Workload: synthetic noisy overlap pairs shaped like the E. coli config
(4 kb reads, ~10% pairwise divergence), 16384 pairs/batch.

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


def _production_throughput(ext, a_oid, b_oid, d0, JMAX, M, iters):
    """Steady-state production throughput: extend_async dispatches per
    batch (index vectors ship host->device each call, exactly like
    overlap_reads), materialize fetches the [5, M] results.  NOTE:
    jax.block_until_ready does NOT synchronize through the axon tunnel
    (measured round 2: a 37 ms kernel "completed" in 0.05 ms) — only an
    actual fetch is a reliable barrier, so the loop barrier is the
    materialize of the final batch."""
    # warm: compile (persistent-cached) + one full execution + sanity
    out, Mm = robust(
        lambda: ext.extend_async(a_oid, b_oid, d0, JMAX),
        "compile+warm", delays=(10, 30, 60),
    )
    res = robust(lambda: ext.materialize(out, Mm), "warm sync")
    n_found = int((res.diffs < (1 << 15)).sum())
    assert n_found > 0.95 * M, (
        f"bench workload broken: only {n_found}/{M} pairs aligned"
    )

    def timed():
        t0 = time.time()
        last = None
        for _ in range(iters):
            last = ext.extend_async(a_oid, b_oid, d0, JMAX)
        ext.materialize(last[0], last[1])  # real fetch barrier
        return (time.time() - t0) / iters

    return robust(timed, "timed loop")


def _myers_kernel_only(oriented, lengths, a_oid, b_oid, d0, W, J, iters):
    """Myers bit-vector fwd+rev kernel rate with device-resident, pre-built
    operands (roofline tracking; stderr only).  Windows are prepped once via
    the table path (incl. one fwd run to fix the reverse anchors); the timed
    loop runs both Pallas kernels on frozen operands."""
    import jax
    import jax.numpy as jnp

    from phasm_tpu.overlap import myers as MY
    from phasm_tpu.overlap import myers_pallas as MP

    dev_o = put_chunked(oriented)
    lengths_d = robust(
        lambda: jax.device_put(lengths.astype(np.int32)), "upload lengths"
    )
    idx = [
        robust(lambda x=x: jax.device_put(x.astype(np.int32)), "upload idx")
        for x in (a_oid, b_oid, d0)
    ]
    tabs = jax.jit(MY.build_myers_tables)(dev_o, lengths_d)
    LA = int(oriented.shape[1])

    @jax.jit
    def prep(peq_tab, bpk_tab, lengths, a_oid, b_oid, d0):
        la = lengths[a_oid >> 1]
        lb = lengths[b_oid >> 1]
        peqT = jnp.transpose(peq_tab[a_oid], (2, 1, 0))
        bpkT = jnp.transpose(bpk_tab[b_oid], (2, 1, 0))
        peq_f, bpk_f, la_rel, m0 = MY.fwd_prep_tab(peqT, bpkT, la, d0, W, J)
        fwd = MP._get_fwd(W, J, False)
        B = a_oid.shape[0]
        _, iend_rel, jend, _ = [
            x.reshape(B)
            for x in fwd(
                MP._q(la_rel), MP._q(la), MP._q(lb), MP._q(d0),
                MP._q(peq_f), MP._q(bpk_f),
            )
        ]
        iend = iend_rel + m0 * MY.WB
        peq_r, bpk_r, row_off = MY.rev_prep_tab(
            peqT, bpkT, LA, iend, jend, d0, W, J
        )
        return (la_rel, la, lb, d0, peq_f, bpk_f,
                row_off, iend, jend, peq_r, bpk_r)

    ops = prep(tabs["peq"], tabs["bpk"], lengths_d, *idx)
    (la_rel, la, lb, d0d, peq_f, bpk_f,
     row_off, iend, jend, peq_r, bpk_r) = ops

    @jax.jit
    def kernels(la_rel, la, lb, d0, peq_f, bpk_f,
                row_off, iend, jend, peq_r, bpk_r):
        fwd = MP._get_fwd(W, J, False)
        rev = MP._get_rev(W, J, False)
        cf, _, _, _ = fwd(
            MP._q(la_rel), MP._q(la), MP._q(lb), MP._q(d0),
            MP._q(peq_f), MP._q(bpk_f),
        )
        cr, br = rev(
            MP._q(row_off), MP._q(iend), MP._q(jend),
            MP._q(peq_r), MP._q(bpk_r),
        )
        return cf, cr, br

    robust(lambda: np.asarray(kernels(*ops)[0]), "myers kernel warm",
           delays=(10, 30, 60))

    def timed():
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = kernels(*ops)
        np.asarray(out[0])  # real barrier
        return (time.time() - t0) / iters

    return robust(timed, "myers kernel timed loop")


def main():
    import sys

    import jax

    from phasm_tpu.overlap.engine import OverlapConfig, _resolve_backend
    from phasm_tpu.overlap.extend import (
        DeviceExtender,
        _enable_compilation_cache,
    )

    _enable_compilation_cache()  # BEFORE any jit: warm runs skip remote compiles
    backend = jax.default_backend()

    W = 64
    if backend == "tpu":
        # batch = the engine's _MAX_BATCH: the per-call fixed cost (stacked
        # index upload + tunnel dispatch + fetch, ~5-6 ms) must amortize
        # over the same pair count production uses
        JMAX, M, iters = 2048, 65536, 15
        READ_LEN, N_READS = 4096, 512
    else:
        JMAX, M, iters = 1024, 256, 3
        READ_LEN, N_READS = 1200, 1024

    rng = np.random.default_rng(0)
    oriented, lengths, a_oid, b_oid, d0 = make_batch(
        rng, N_READS, READ_LEN, M, JMAX
    )

    if backend == "tpu":
        dp_backend = _resolve_backend(OverlapConfig())
        ext = DeviceExtender(oriented, lengths, band=W, backend=dp_backend)
        dt = _production_throughput(
            ext, a_oid, b_oid, d0.astype(np.int32), JMAX, M, iters
        )

        # kernel-only roofline numbers -> stderr (NOT the tracked series)
        try:
            dt_myers_k = _myers_kernel_only(
                oriented, lengths, a_oid, b_oid, d0, W, JMAX, iters
            )
            print(
                f"# kernel-only myers fwd+rev: {M / dt_myers_k:,.0f} "
                f"aligns/s ({dt_myers_k * 1e3:.1f} ms/batch)",
                file=sys.stderr,
            )
        except Exception as e:
            # diagnostic path only — but fail LOUDLY on programming errors
            # (ADVICE r2: a NameError here once silently vanished)
            import traceback

            traceback.print_exc()
            print(f"# myers kernel-only path failed: {type(e).__name__}",
                  file=sys.stderr)
        kernel = dp_backend
    else:
        from phasm_tpu.overlap.extend import (
            _get_jit_batch,
            prepare_pair_tensors,
        )

        a2, b2, la, lb = prepare_pair_tensors(
            oriented, lengths, a_oid, b_oid, d0, W, JMAX
        )
        runj = _get_jit_batch()
        args = [jax.device_put(x) for x in (a2, b2, la, lb, d0.astype(np.int32))]
        np.asarray(runj(*args, band=W)[0])
        t0 = time.time()
        for _ in range(iters):
            out = runj(*args, band=W)
        np.asarray(out[0])
        dt = (time.time() - t0) / iters
        kernel = "jnp"

    aps = M / dt
    print(
        json.dumps(
            {
                "metric": (
                    f"overlap_alignments_per_sec_per_chip"
                    f"[{backend},production,{kernel},band{W},j{JMAX}]"
                ),
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
            for ln in p.stderr.splitlines():  # keep roofline diagnostics
                if ln.startswith("#"):
                    print(ln, file=sys.stderr)
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
