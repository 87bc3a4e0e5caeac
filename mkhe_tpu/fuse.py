"""Whole-pipeline fusion — compile any homomorphic pipeline into ONE XLA
program.

Each dispatched evaluator op pays host-runtime overhead comparable to the
op itself on a remote TPU; fusing a whole pipeline leaves a single
dispatch and lets XLA schedule across op boundaries (the encrypted-CNN
demo drops from ~650 ms staged to ~99 ms fused on one v5e chip; see
benchmarks/bench_cnn.py).

Key material cannot be baked into the traced program as constants (a
pipeline touches hundreds of MB of switching keys, and constants would
force a recompile per key set). Instead a recording pass (jax.eval_shape
— abstract, no compute) discovers which *stacked key combinations* the
pipeline requests from its RelinearizationKeySet / RotationKeySet /
ConjugationKeySet, and the compiled program takes those tables as jit
arguments — new keys or re-encrypted inputs reuse the compiled program.

No reference analog: the Go library executes ops eagerly one at a time
(mkckks/evaluator.go); this module is the TPU-native runtime tier.

Usage::

    def pipeline(ev, keys, ct_a, ct_b):
        prod = ev.mul_relin_new(ct_a, ct_b, keys.rlk)
        return ev.rotate_new(prod, 1, keys.rtk)

    fn, args = fuse.fuse(params, pipeline, (ct_a, ct_b),
                         rlk_set=rlk, rtk_set=rtk)
    out = fn(*args)            # one XLA program
    # new inputs, same compiled program:
    out2 = fn(args[0], args[1], (ct_a2, ct_b2))
"""

from __future__ import annotations

import dataclasses
import types

import jax
import jax.numpy as jnp


class _RecordRlk:
    """Recording shim used under jax.eval_shape: logs which stacked key
    combinations the pipeline requests and returns shape-matched zero
    placeholders (eval_shape computes nothing, and calling the real
    set's .stacked inside the trace would cache leaked tracers)."""

    def __init__(self, real):
        self.real, self.requests = real, []

    def stacked(self, ids):
        k = tuple(ids)
        if k not in self.requests:
            self.requests.append(k)
        kk = self.real.get(ids[0])
        z = lambda a: jnp.zeros((len(ids),) + tuple(a.shape), a.dtype)
        return z(kk.b), z(kk.d), z(kk.v)


class _RecordRtk:
    def __init__(self, real):
        self.real, self.requests = real, []

    def stacked(self, ids, rot):
        k = (tuple(ids), rot)
        if k not in self.requests:
            self.requests.append(k)
        a = self.real.get(ids[0], rot).data
        return jnp.zeros((len(ids),) + tuple(a.shape), a.dtype)


class _RecordCjk:
    def __init__(self, real):
        self.real, self.requests = real, []

    def stacked(self, ids):
        k = tuple(ids)
        if k not in self.requests:
            self.requests.append(k)
        a = self.real.get(ids[0]).data
        return jnp.zeros((len(ids),) + tuple(a.shape), a.dtype)


class _Replay:
    def __init__(self, table):
        self.table = table

    def stacked(self, ids, rot=None):
        return self.table[tuple(ids) if rot is None
                          else (tuple(ids), rot)]


def _keys_ns(rlk, rtk, cjk):
    return types.SimpleNamespace(rlk=rlk, rtk=rtk, cjk=cjk)


def fuse(params, pipeline, cts, rlk_set=None, rtk_set=None, cjk_set=None):
    """Compile `pipeline(ev, keys, *cts)` into one jitted callable.

    - `params`: mkckks.Parameters or mkbfv.Parameters (scheme inferred).
    - `pipeline(ev, keys, *cts) -> ciphertext pytree`, written against
      the normal Evaluator API; `keys.rlk/.rtk/.cjk` stand in for the
      key sets.
    - `cts`: tuple of ciphertexts / pytrees of ciphertexts (plaintexts
      encoded as arrays are fine too) — these become jit arguments.

    Returns `(fn, args)`; `fn(*args)` runs the pipeline on device. To
    run on new inputs, replace the trailing `args[2]` tuple (the first
    two entries are the parameter pytree and the recorded key tables).
    """
    from . import mkbfv, mkckks

    is_bfv = isinstance(params, mkbfv.Parameters)

    def _make_ev(p_arg):
        if is_bfv:
            return mkbfv.Evaluator(p_arg)
        return mkckks.Evaluator(dataclasses.replace(params, rlwe=p_arg))

    p_arg = params if is_bfv else params.rlwe

    # recording pass: abstract trace, no compute — fills the key tables
    rec = _keys_ns(_RecordRlk(rlk_set) if rlk_set is not None else None,
                   _RecordRtk(rtk_set) if rtk_set is not None else None,
                   _RecordCjk(cjk_set) if cjk_set is not None else None)

    def _record(p_arg, cts):
        return pipeline(_make_ev(p_arg), rec, *cts)

    jax.eval_shape(_record, p_arg, cts)

    # materialize the recorded key tables OUTSIDE the trace
    tables = {}
    if rlk_set is not None:
        tables["rlk"] = {k: rlk_set.stacked(k) for k in rec.rlk.requests}
    if rtk_set is not None:
        tables["rtk"] = {k: rtk_set.stacked(*k) for k in rec.rtk.requests}
    if cjk_set is not None:
        tables["cjk"] = {k: cjk_set.stacked(k) for k in rec.cjk.requests}

    @jax.jit
    def _run(p_arg, tables, cts):
        keys = _keys_ns(
            _Replay(tables["rlk"]) if "rlk" in tables else None,
            _Replay(tables["rtk"]) if "rtk" in tables else None,
            _Replay(tables["cjk"]) if "cjk" in tables else None)
        return pipeline(_make_ev(p_arg), keys, *cts)

    return _run, (p_arg, tables, tuple(cts))


def fuse_chained(params, pipeline, cts, chain, rlk_set=None,
                 rtk_set=None, cjk_set=None):
    """Like fuse(), but returns run_k(p_arg, tables, cts, k): the
    pipeline executes k+1 times inside ONE jitted program, each
    iteration's inputs derived from the previous output via
    `chain(cts, out) -> cts` (a genuine data dependency, so XLA cannot
    collapse the repeats). The (t(k2) - t(k1)) / (k2 - k1) slope then
    isolates per-run DEVICE time from the relay dispatch/fetch round
    trip — the same protocol as bench.py's headline (benchmarks)."""
    import dataclasses as _dc

    from . import mkbfv, mkckks

    _fn, (p_arg, tables, cts_t) = fuse(params, pipeline, cts,
                                       rlk_set=rlk_set, rtk_set=rtk_set,
                                       cjk_set=cjk_set)
    is_bfv = isinstance(params, mkbfv.Parameters)

    def _make_ev(p_a):
        if is_bfv:
            return mkbfv.Evaluator(p_a)
        return mkckks.Evaluator(_dc.replace(params, rlwe=p_a))

    @jax.jit
    def _run_k(p_a, tables_, cts_, k):
        keys = _keys_ns(
            _Replay(tables_["rlk"]) if "rlk" in tables_ else None,
            _Replay(tables_["rtk"]) if "rtk" in tables_ else None,
            _Replay(tables_["cjk"]) if "cjk" in tables_ else None)

        def body(i, c):
            out = pipeline(_make_ev(p_a), keys, *c)
            return chain(c, out)

        cts_f = jax.lax.fori_loop(0, k, body, tuple(cts_))
        return pipeline(_make_ev(p_a), keys, *cts_f)

    return _run_k, (p_arg, tables, cts_t)
