"""Generate deterministic synthetic FASTA benchmark inputs (gitignored).

Usage: python tests/make_synth_fasta.py <out.fa> <n_bases> [--reads L] [--seed S]

Default emits one long random contig; --reads L splits into records of
length L. A small fraction of N's is injected to exercise chunk splitting.
"""
import sys

import numpy as np


def write_synth(out: str, n_bases: int, read_len: int = 0,
                seed: int = 1234) -> None:
    n = n_bases
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    alphabet = np.frombuffer(b"ACTG", dtype=np.uint8)
    seq = alphabet[codes]
    # inject sparse N runs (~0.01%)
    n_ns = max(1, n // 10000)
    pos = rng.integers(0, n, size=n_ns)
    seq[pos] = ord("N")
    seq = seq.tobytes().decode()
    with open(out, "w") as f:
        if read_len:
            for i, j in enumerate(range(0, n, read_len)):
                f.write(f">r{i}\n{seq[j:j+read_len]}\n")
        else:
            f.write(">synth\n")
            for j in range(0, n, 80):
                f.write(seq[j:j + 80] + "\n")


def main():
    out = sys.argv[1]
    n = int(sys.argv[2])
    read_len = 0
    seed = 1234
    args = sys.argv[3:]
    while args:
        a = args.pop(0)
        if a == "--reads":
            read_len = int(args.pop(0))
        elif a == "--seed":
            seed = int(args.pop(0))
    write_synth(out, n, read_len, seed)
    print(f"wrote {out}: {n} bases, reads={read_len or 'single contig'}")


if __name__ == "__main__":
    main()
