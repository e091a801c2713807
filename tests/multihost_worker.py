"""Worker process for tests/test_multihost.py: joins a 2-process
jax.distributed cluster (4 virtual CPU devices each) and drives the FULL
product path — ShardedBrisk.insert_file over the 8-device global mesh
(host-major lanes: each process packs only its own records' windows,
sharded windowed insert with the cross-shard equality chain, batched
repairs, lockstep flush padding) — then dumps its local shards'
aggregated counts as JSON and writes its checkpoint file.

Usage: python multihost_worker.py <port> <process_id> <num_processes>
       <out_json>
"""
import json
import os
import random
import sys


def main():
    port, pid, nproc, out_path = (sys.argv[1], int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from brisk_tpu.parallel import multihost
    from brisk_tpu.parallel.facade import ShardedBrisk
    from brisk_tpu.params import Parameters

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    k, m, b = 31, 11, 8

    # identical record stream on every process; insert_file assigns
    # ownership round-robin by record index
    rng = random.Random(97)
    records = ["".join(rng.choice("ACGT") for _ in range(rng.randint(k, 400)))
               for _ in range(24)]
    fasta_path = out_path + ".fa"
    with open(fasta_path, "w") as f:
        for i, r in enumerate(records):
            f.write(f">r{i}\n{r}\n")

    sb = ShardedBrisk(Parameters(k=k, m=m, b=b), batch_per_shard=4,
                      window=96, stack=2, capacity=1 << 15)
    assert sb.multihost and sb.n_shards == 8
    sb.insert_file(fasta_path)
    stats = sb.stats()

    # collective scalar lookup (both processes issue the same query)
    probe = records[0][:k]
    probe_count = sb.get_canonical(probe)
    assert probe_count is not None and probe_count >= 1

    # multi-host checkpoint: this process writes only its shards (both
    # workers share one prefix, so the test can reassemble all of them)
    sb.save(os.path.join(os.path.dirname(os.path.abspath(out_path)),
                         "ckpt"))

    agg = {}
    for kv, c in sb.items():  # local shards only
        key = str(kv)
        agg[key] = (agg.get(key, 0) + c) % 256

    with open(out_path, "w") as f:
        json.dump({"process": pid, "shards": sb.my_shards,
                   "n_emitted": stats["nb_emitted"],
                   "nb_kmers": stats["nb_kmers"],
                   "n_repaired": sb.n_repaired_windows,
                   "counts": agg}, f)
    print(f"worker {pid}: ok ({len(agg)} entries on shards {sb.my_shards})")


if __name__ == "__main__":
    main()
