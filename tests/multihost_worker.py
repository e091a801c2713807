"""Worker process for tests/test_multihost.py: joins a 2-process
jax.distributed cluster (4 virtual CPU devices each), runs the sharded
insert pipeline over the 8-device global mesh, and dumps its local
shards' aggregated counts as JSON.

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

    from brisk_tpu.index import readout, store
    from brisk_tpu.io.fasta import BatchPacker
    from brisk_tpu.ops import enumerate as enum_ops
    from brisk_tpu.parallel import multihost, sharded
    from brisk_tpu.params import Parameters

    import jax.numpy as jnp
    import numpy as np

    multihost.initialize(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    mesh = multihost.global_mesh()
    n_shards = mesh.shape["x"]
    k, m, b = 31, 11, 8
    B, l_new = 8, 64

    # identical record stream on every process (each materializes only
    # its own lanes' shards)
    rng = random.Random(97)
    records = ["".join(rng.choice("ACGT") for _ in range(rng.randint(k, 400)))
               for _ in range(24)]

    state = multihost.sharded_empty_global(n_shards, 16384, mesh,
                                           store.key_words(k, b))
    carry_np = [np.asarray(x) for x in enum_ops.zero_carry(B)]
    carry = enum_ops.MinimizerState(
        *(multihost.shard_batch(mesh, x) for x in carry_np))
    packer = BatchPacker(k, B, l_new)
    total_emitted = 0
    for bt in packer.pack(iter(records)):
        state, carry, stats = sharded.sharded_insert_step(
            state, multihost.shard_batch(mesh, bt.codes.astype(np.uint32)),
            multihost.shard_batch(mesh, bt.fresh),
            multihost.shard_batch(mesh, bt.valid_end), carry,
            k=k, m=m, b=b, mesh=mesh, route_cap=512)
        total_emitted += int(stats.n_emitted)  # replicated -> readable
        assert int(stats.n_spilled) == 0
        state = sharded.sharded_compact(state, mesh)

    # local readout: this process's shards only
    params = Parameters(k=k, m=m, b=b)
    agg = {}
    my_shards = []
    for d, local in multihost.local_entries(state):
        my_shards.append(d)
        kmers, counts, buckets = readout.entries(local, params)
        assert all(int(bk) % n_shards == d for bk in buckets)
        for kv, c in zip(kmers, counts):
            key = str(int(kv))
            agg[key] = (agg.get(key, 0) + int(c)) % 256

    with open(out_path, "w") as f:
        json.dump({"process": pid, "shards": my_shards,
                   "n_emitted": total_emitted, "counts": agg}, f)
    print(f"worker {pid}: ok ({len(agg)} entries on shards {my_shards})")


if __name__ == "__main__":
    main()
