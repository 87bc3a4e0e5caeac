"""Basis extension / ModDown / rescale / decomposition properties, checked
against exact python-int arithmetic (mirrors the identities exercised by
the reference's testDecompose / ModDown tests, mkrlwe_test.go:456-610)."""

import numpy as np
import jax.numpy as jnp

from mkhe_tpu.ops.ring import Ring
from mkhe_tpu.ops.primes import ntt_primes
from mkhe_tpu.ops import basis
from mkhe_tpu.utils import crt

rng = np.random.default_rng(2)


def _rings(logn=6):
    qm = ntt_primes(logn, 28.6, 6)
    pm = ntt_primes(logn, 28.9, 2)
    return Ring.create(qm, logn), Ring.create(pm, logn)


def _rand_rns(moduli, n):
    qs = np.array(moduli, np.uint64)
    x = rng.integers(0, 1 << 62, size=(len(moduli), n), dtype=np.uint64)
    return (x % qs[:, None]).astype(np.uint32)


def test_mod_up_exact():
    ring_q, ring_p = _rings()
    n = ring_q.n
    Q = int(np.prod(np.array(ring_q.moduli, dtype=object)))
    vals = rng.integers(0, 1 << 50, size=n, dtype=np.uint64).astype(object)
    vals = vals * rng.integers(1, 1 << 50, size=n, dtype=np.uint64) % Q
    xq = crt.to_rns(vals, ring_q.moduli)
    t = basis.mod_up_tables(ring_q.moduli, ring_p.moduli)
    out = np.asarray(basis.mod_up(jnp.asarray(xq), ring_q, ring_p, t))
    for j, pj in enumerate(ring_p.moduli):
        want = np.array([int(v) % pj for v in vals], np.uint64)
        got = out[j].astype(np.uint64)
        # allow the documented rare +-Q slack
        diff = (got + pj - want) % pj
        qmod = Q % pj
        ok = (diff == 0) | (diff == qmod) | (diff == (pj - qmod) % pj)
        assert ok.all(), f"limb {j}: {np.argwhere(~ok)[:5]}"


def test_mod_down_rounding():
    """mod_down(x*P + r) == x + round(r/P) up to +-1 (HPS rounding)."""
    ring_q, ring_p = _rings()
    n = ring_q.n
    Q = int(np.prod(np.array(ring_q.moduli, dtype=object)))
    P = int(np.prod(np.array(ring_p.moduli, dtype=object)))
    base = [int(b) for b in rng.integers(0, 1 << 40, size=n, dtype=np.uint64)]
    noise = [int(b) for b in rng.integers(0, 1 << 30, size=n, dtype=np.uint64)]
    vals = [(b * P + r) % (Q * P) for b, r in zip(base, noise)]
    xq = crt.to_rns(vals, ring_q.moduli)
    xp = crt.to_rns(vals, ring_p.moduli)
    out = np.asarray(basis.mod_down(jnp.asarray(xq), jnp.asarray(xp),
                                    ring_q, ring_p))
    got = crt.crt_center(out, ring_q.moduli)
    for g, b, r in zip(got, base, noise):
        want = b + (r + P // 2) // P
        assert abs(int(g) - want) <= 1


def test_decompose_gadget_identity():
    """sum_d digit_d * (Q/B_d) * ((Q/B_d)^{-1} mod B_d) == x (mod Q), the
    gadget reconstruction identity behind GenSwitchingKey
    (mkrlwe/keygen.go:301-307), for alpha=1 and alpha=2."""
    ring_q, ring_p = _rings()
    ring_qp = ring_q.concat(ring_p)
    n = ring_q.n
    Q = int(np.prod(np.array(ring_q.moduli, dtype=object)))
    vals = [int(v) for v in rng.integers(0, 1 << 60, size=n, dtype=np.uint64)]
    xq = crt.to_rns(vals, ring_q.moduli)
    qp_mods = np.array(ring_qp.moduli, np.uint64)
    for alpha in (1, 2):
        # digits are lazy residues (< 4q); reduce to canonical for the
        # integer model below (the congruence mod q_j is the contract)
        digits = np.asarray(basis.decompose_digits(
            jnp.asarray(xq), ring_q, ring_qp, alpha))
        digits = (digits.astype(np.uint64)
                  % qp_mods[None, :, None]).astype(np.uint32)
        lq = len(ring_q.moduli)
        beta = -(-lq // alpha)
        recon = np.zeros(n, dtype=object)
        for d in range(beta):
            Bd = 1
            for q in ring_q.moduli[d * alpha:(d + 1) * alpha]:
                Bd *= q
            g = (Q // Bd) * pow((Q // Bd) % Bd, -1, Bd) % Q
            # read the digit value from a Q-limb where it is exact:
            # reconstruct digit from its own source limbs (they hold the
            # digit canonically)
            dig = crt.crt_reconstruct(
                digits[d, d * alpha:(d + 1) * alpha],
                ring_q.moduli[d * alpha:(d + 1) * alpha])
            recon = (recon + dig * g) % Q
        want = np.array([v % Q for v in vals], dtype=object)
        # digits may carry + small*Bd slack (alpha>1 mod_up) -> g*Bd = Q*k
        assert all((int(a) - int(b)) % Q == 0 for a, b in zip(recon, want))


def test_decompose_digits_consistent_across_limbs():
    """Each digit's residues across all QP limbs represent one integer."""
    ring_q, ring_p = _rings()
    ring_qp = ring_q.concat(ring_p)
    n = ring_q.n
    vals = [int(v) for v in rng.integers(0, 1 << 60, size=n, dtype=np.uint64)]
    xq = crt.to_rns(vals, ring_q.moduli)
    digits = np.asarray(basis.decompose_digits(
        jnp.asarray(xq), ring_q, ring_qp, 2))
    digits = (digits.astype(np.uint64)
              % np.array(ring_qp.moduli, np.uint64)[None, :, None]
              ).astype(np.uint32)
    for d in range(digits.shape[0]):
        lo = d * 2
        Bd = ring_q.moduli[lo] * ring_q.moduli[lo + 1]
        dig = crt.crt_reconstruct(digits[d, lo:lo + 2],
                                  ring_q.moduli[lo:lo + 2])
        for j, qj in enumerate(ring_qp.moduli):
            res = digits[d, j].astype(np.uint64)
            want = np.array([(int(v)) % qj for v in dig], np.uint64)
            # slack multiple of Bd allowed
            ok = [(int(r) - int(w)) % qj in (0, Bd % qj, (2 * Bd) % qj)
                  for r, w in zip(res, want)]
            assert all(ok)


def test_div_round_by_last_moduli():
    ring_q, _ = _rings()
    n = ring_q.n
    moduli = ring_q.moduli
    Q = int(np.prod(np.array(moduli, dtype=object)))
    vals = [int(v) % Q for v in
            rng.integers(0, 1 << 63, size=n, dtype=np.uint64)]
    xq = crt.to_rns(vals, moduli)
    for nb in (1, 2):
        drop = 1
        for q in moduli[len(moduli) - nb:]:
            drop *= q
        out = np.asarray(basis.div_round_by_last_moduli(
            jnp.asarray(xq), ring_q, nb))
        got = crt.crt_reconstruct(out, moduli[:len(moduli) - nb])
        Qr = Q // drop
        for g, v in zip(got, vals):
            want = ((v + drop // 2) // drop) % Qr
            assert int(g) % Qr == want % Qr
