"""Unit tests: JAX ops vs the exact Python oracle."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from brisk_tpu.oracle import pyref
from brisk_tpu.ops import codec, decycling, hashing, minimizer, revcomp, u128

random.seed(123)


def rand_seq(n):
    return "".join(random.choice("ACGT") for _ in range(n))


def codes_of(s):
    return codec.encode_ascii(
        jnp.asarray(np.frombuffer(s.encode(), dtype=np.uint8)))


def limbs_to_ints(limbs, idx=None):
    arrs = [np.asarray(l) for l in limbs]
    total = np.zeros(arrs[0].shape, dtype=object)
    for i, a in enumerate(arrs):
        total = total + (a.astype(object) << (32 * i))
    return total


class TestU128:
    def test_shifts_and_masks(self):
        vals = [random.getrandbits(128) for _ in range(50)]
        arr = tuple(jnp.asarray([(v >> (32 * i)) & 0xFFFFFFFF for v in vals],
                                dtype=jnp.uint32) for i in range(4))
        for s in [0, 1, 2, 21, 31, 32, 33, 62, 64, 97, 127]:
            got = limbs_to_ints(u128.shl(arr, s))
            exp = [(v << s) & ((1 << 128) - 1) for v in vals]
            assert list(got) == exp, f"shl {s}"
            got = limbs_to_ints(u128.shr(arr, s))
            assert list(got) == [v >> s for v in vals], f"shr {s}"
        for nb in [0, 1, 30, 32, 62, 64, 126]:
            got = limbs_to_ints(u128.mask_bits(arr, nb))
            assert list(got) == [v & ((1 << nb) - 1) for v in vals]

    def test_var_shifts(self):
        vals = [random.getrandbits(128) for _ in range(64)]
        shifts = [random.randrange(0, 127) for _ in range(64)]
        arr = tuple(jnp.asarray([(v >> (32 * i)) & 0xFFFFFFFF for v in vals],
                                dtype=jnp.uint32) for i in range(4))
        s = jnp.asarray(shifts, dtype=jnp.uint32)
        got = limbs_to_ints(u128.shl_var(arr, s))
        assert list(got) == [(v << sh) & ((1 << 128) - 1)
                             for v, sh in zip(vals, shifts)]
        got = limbs_to_ints(u128.shr_var(arr, s))
        assert list(got) == [v >> sh for v, sh in zip(vals, shifts)]

    def test_add_compare(self):
        a_v = [random.getrandbits(64) for _ in range(100)]
        b_v = [random.getrandbits(64) for _ in range(100)]
        a = tuple(jnp.asarray([(v >> (32 * i)) & 0xFFFFFFFF for v in a_v],
                              dtype=jnp.uint32) for i in range(2))
        b = tuple(jnp.asarray([(v >> (32 * i)) & 0xFFFFFFFF for v in b_v],
                              dtype=jnp.uint32) for i in range(2))
        got = limbs_to_ints(u128.add(a, b))
        assert list(got) == [(x + y) & ((1 << 64) - 1)
                             for x, y in zip(a_v, b_v)]
        assert list(np.asarray(u128.lt(a, b))) == [x < y for x, y
                                                   in zip(a_v, b_v)]
        assert list(np.asarray(u128.le(a, b))) == [x <= y for x, y
                                                   in zip(a_v, b_v)]


class TestCodec:
    @pytest.mark.parametrize("k,m", [(31, 11), (63, 21), (5, 3), (32, 15),
                                     (33, 17), (63, 31), (17, 16)])
    def test_kmer_windows(self, k, m):
        s = rand_seq(200)
        fwd_k, rc_k, fwd_m, rc_m = codec.kmer_windows(codes_of(s), k, m)
        fk, rk = limbs_to_ints(fwd_k), limbs_to_ints(rc_k)
        fm, rm = limbs_to_ints(fwd_m), limbs_to_ints(rc_m)
        for p in range(k - 1, len(s)):
            w = s[p - k + 1: p + 1]
            assert fk[p] == pyref.str2num(w), f"fwd_k p={p}"
            assert rk[p] == pyref.revcomp(pyref.str2num(w), k), f"rc_k p={p}"
        for p in range(m - 1, len(s)):
            w = s[p - m + 1: p + 1]
            assert fm[p] == pyref.str2num(w)
            assert rm[p] == pyref.revcomp(pyref.str2num(w), m)


class TestRevcomp:
    @pytest.mark.parametrize("m", [3, 11, 16, 21, 31, 32])
    def test_rcb64(self, m):
        vals = [random.getrandbits(2 * m) for _ in range(200)]
        lo = jnp.asarray([v & 0xFFFFFFFF for v in vals], dtype=jnp.uint32)
        hi = jnp.asarray([v >> 32 for v in vals], dtype=jnp.uint32)
        got = limbs_to_ints(revcomp.rcb64(lo, hi, m))
        assert list(got) == [pyref.rcb64(v, m) for v in vals]
        got = limbs_to_ints(revcomp.canonize64(lo, hi, m))
        assert list(got) == [pyref.canonize64(v, m) for v in vals]

    @pytest.mark.parametrize("k", [5, 31, 32, 33, 48, 63])
    def test_rcb128_broken(self, k):
        vals = [random.getrandbits(2 * k) for _ in range(200)]
        limbs = tuple(jnp.asarray([(v >> (32 * i)) & 0xFFFFFFFF
                                   for v in vals], dtype=jnp.uint32)
                      for i in range(4))
        got = limbs_to_ints(revcomp.rcb128_broken(limbs, k))
        assert list(got) == [pyref.rcb128_broken(v, k) for v in vals]
        got = np.asarray(revcomp.canonized_k(limbs, k))
        assert list(got) == [pyref.canonized_k(v, k) for v in vals]


class TestDecyclingHash:
    @pytest.mark.parametrize("m", [3, 5, 7])
    def test_memdouble_exhaustive(self, m):
        dede = pyref.DecyclingSet(m)
        vals = np.arange(4 ** m, dtype=np.uint32)
        got = np.asarray(decycling.mem_double(
            jnp.asarray(vals), jnp.zeros_like(jnp.asarray(vals)), m))
        exp = np.array([dede.mem_double(int(v)) for v in vals])
        assert (got == exp).all()

    @pytest.mark.parametrize("m", [9, 11, 15, 16, 17, 21, 31])
    def test_memdouble_and_hash_sampled(self, m):
        dede = pyref.DecyclingSet(m)
        mask = (1 << (2 * m)) - 1
        vals = [random.getrandbits(2 * m) for _ in range(3000)]
        # include structured near-boundary cases: homopolymers, periodic
        for v in range(4):
            x = 0
            for _ in range(m):
                x = (x << 2) | v
            vals.append(x)
        vals += [pyref.str2num(("ACGT" * m)[:m]), pyref.str2num(("AT" * m)[:m]),
                 pyref.str2num(("CG" * m)[:m])]
        lo = jnp.asarray([v & 0xFFFFFFFF for v in vals], dtype=jnp.uint32)
        hi = jnp.asarray([v >> 32 for v in vals], dtype=jnp.uint32)
        cls = np.asarray(decycling.mem_double(lo, hi, m))
        exp_cls = np.array([dede.mem_double(v) for v in vals])
        assert (cls == exp_cls).all(), \
            f"memDouble diverged at {np.nonzero(cls != exp_cls)[0][:5]}"
        heavy, hhi, hlo = hashing.bfc_hash(lo, hi, m)
        got = (np.asarray(heavy).astype(object) << 62) \
            | (np.asarray(hhi).astype(object) << 32) \
            | np.asarray(hlo).astype(object)
        exp = [pyref.bfc_hash_64(v, mask, dede) for v in vals]
        assert list(got) == exp


class TestWindowedGetMinimizer:
    @pytest.mark.parametrize("k,m", [(31, 11), (31, 15), (63, 21), (21, 9),
                                     (63, 31), (33, 13), (45, 17)])
    def test_vs_oracle(self, k, m):
        dede = pyref.DecyclingSet(m)
        s = rand_seq(300)
        codes = codes_of(s)
        pa = minimizer.position_pipeline(codes, k, m)
        st = minimizer.windowed_get_minimizer(pa, pa.fwd_k, k, m)
        mini = limbs_to_ints((st.mini_lo, st.mini_hi))
        pos = np.asarray(st.pos)
        rev = np.asarray(st.rev)
        hsh = (np.asarray(st.heavy).astype(object) << 62) \
            | (np.asarray(st.hash_hi).astype(object) << 32) \
            | np.asarray(st.hash_lo).astype(object)
        for p in range(k - 1, len(s)):
            kv = pyref.str2num(s[p - k + 1: p + 1])
            em, ep, er, eh = pyref.get_minimizer(kv, k, m, dede)
            assert (mini[p], pos[p], rev[p], hsh[p]) == (em, ep, er, eh), \
                f"p={p}: got {(mini[p], pos[p], bool(rev[p]), hsh[p])} " \
                f"want {(em, ep, er, eh)}"
