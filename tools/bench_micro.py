"""TPU microbench: fixed-base MSM paths + fused NTT + scaled prover."""
import time, json, sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np
import jax, jax.numpy as jnp
from plonk_tpu.models import plonk_scaled as PS
from plonk_tpu.models.synthetic import square_chain_circuit
from plonk_tpu.utils.params import SCALED_FR, BABYBEAR
from plonk_tpu.ops.field import MontField

print("backend:", jax.default_backend(), flush=True)

# persistent XLA compile cache (works through the remote-compile tunnel;
# 17 s -> 0.4 s re-compiles — same setup as bench.py)
try:
    import os as _os
    _cache = _os.path.expanduser("~/.cache/plonk_tpu/xla_bench")
    _os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def timeit_varied(fn, inputs):
    """Time fn over DISTINCT inputs (first = warmup): duplicate async
    dispatches of the SAME input can collapse in the tunnel stack and
    report impossible rates (CLAUDE.md; ADVICE r4)."""
    out = fn(inputs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for x in inputs[1:]:
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (len(inputs) - 1)


def bench_commit_paths(log_n=16, modes=("select", "gather")):
    from plonk_tpu.ops import fixed_base as FB
    n = 1 << log_n
    ctx = PS.scaled_new(n)
    t0 = time.perf_counter()
    tbl = PS.fixed_base_table(ctx)
    print(f"table build {log_n}: {time.perf_counter()-t0:.1f}s "
          f"wb={tbl.window_bits}", flush=True)
    rng = np.random.default_rng(0)
    sc = jnp.asarray(rng.integers(0, SCALED_FR.p, size=(9, n + 6),
                                  dtype=np.uint32))
    for mode in modes:
        fn = jax.jit(lambda tx, ty, ti, s: FB.msm_fixed_base_many(
            ctx.Fq, FB.FixedBaseTable(tx, ty, ti, tbl.window_bits), s,
            mode=mode))
        try:
            dt = timeit(lambda s: fn(tbl.x, tbl.y, tbl.inf, s), sc)
            print(json.dumps({"commit9_mode": mode, "log_n": log_n,
                              "ms": round(dt * 1000, 2)}), flush=True)
        except Exception as e:
            print(f"{mode} failed: {str(e)[:150]}", flush=True)
    return ctx


def bench_fused_ntt(log_n=20):
    from plonk_tpu.ops import fused_ntt as FN
    from plonk_tpu.ops import ntt as N
    M = MontField(BABYBEAR)
    n = 1 << log_n
    w = BABYBEAR.root_of_unity(n)
    rng = np.random.default_rng(0)
    x = M.encode(np.asarray(rng.integers(0, M.p, size=n, dtype=np.uint32)))
    f1 = jax.jit(lambda v: FN.fused_ntt(M, v, w))
    f2 = jax.jit(lambda v: FN.fused_ntt_natural(M, v, w))
    f3 = jax.jit(lambda v: N.ntt(M, v, w))
    out = f2(x)
    ref = jax.jit(lambda v: N.ntt(M, v, w, layout="simple"))(x)
    ok = bool(jnp.array_equal(out, ref))
    print(json.dumps({
        "fused_scrambled_ms": round(timeit(f1, x) * 1000, 3),
        "fused_natural_ms": round(timeit(f2, x) * 1000, 3),
        "blocked_ms": round(timeit(f3, x) * 1000, 3),
        "parity_ok": ok,
        "fused_natural_elems_per_s": round(n / timeit(f2, x), 0),
    }), flush=True)


def bench_prover(ctx, log_n=16):
    n = 1 << log_n
    sel, copies, a, b, c = square_chain_circuit(SCALED_FR.p, n)
    ch = np.array([1111, 2222, 3333, 4444, 5555], dtype=np.uint32)
    rnd = np.arange(1, 10, dtype=np.uint32)
    t0 = time.perf_counter()
    prover = PS.make_prover(ctx, sel, copies)
    out = prover(a, b, c, ch, rnd)
    jax.block_until_ready(out)
    print(f"prove compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    proof, diags = out
    assert bool(diags.all_ok())
    dt = timeit(lambda: prover(a, b, c, ch, rnd), reps=5)
    print(json.dumps({"prove_log_n": log_n,
                      "ms_per_proof": round(dt * 1000, 2),
                      "proofs_per_s": round(1 / dt, 2)}), flush=True)


def bench_pallas_commit(log_n=16):
    """Fused Pallas commit kernel vs the XLA select sweep, same scalars;
    on-device parity asserted."""
    import os
    from plonk_tpu.ops import fixed_base as FB
    from plonk_tpu.ops import pallas_msm as PM
    n = 1 << log_n
    os.environ["PLONK_TPU_PALLAS_MSM"] = "1"
    ctx = PS.scaled_new(n)
    t0 = time.perf_counter()
    ptbl = PS.fixed_base_table(ctx)              # narrow-window layout
    print(f"pallas table build {log_n}: {time.perf_counter()-t0:.1f}s "
          f"wb={ptbl.window_bits} shape={tuple(ptbl.x.shape)}", flush=True)
    rng = np.random.default_rng(0)
    sc = jnp.asarray(rng.integers(0, SCALED_FR.p, size=(9, n + 6),
                                  dtype=np.uint32))
    fnp = jax.jit(lambda tx, ty, ti, s: PM.msm_fixed_base_many_pallas(
        ctx.Fq, FB.FixedBaseTable(tx, ty, ti, ptbl.window_bits), s))
    dt = timeit(lambda s: fnp(ptbl.x, ptbl.y, ptbl.inf, s), sc)
    print(json.dumps({"commit9_mode": "pallas-fused", "log_n": log_n,
                      "wb": ptbl.window_bits,
                      "ms": round(dt * 1000, 2)}), flush=True)
    # parity + select-path comparison on the same context
    os.environ["PLONK_TPU_PALLAS_MSM"] = "0"
    ctx2 = PS.scaled_new(n)
    stbl = PS.fixed_base_table(ctx2)
    fns = jax.jit(lambda tx, ty, ti, s: FB.msm_fixed_base_many(
        ctx.Fq, FB.FixedBaseTable(tx, ty, ti, stbl.window_bits), s,
        mode="select"))
    got = fnp(ptbl.x, ptbl.y, ptbl.inf, sc)
    ref = fns(stbl.x, stbl.y, stbl.inf, sc)
    ok = (bool(jnp.array_equal(got.x, ref.x))
          and bool(jnp.array_equal(got.y, ref.y))
          and bool(jnp.array_equal(got.inf, ref.inf)))
    dt2 = timeit(lambda s: fns(stbl.x, stbl.y, stbl.inf, s), sc)
    print(json.dumps({"commit9_mode": "select", "log_n": log_n,
                      "ms": round(dt2 * 1000, 2),
                      "pallas_parity_on_device": ok}), flush=True)
    assert ok, "pallas commit parity failed on device"
    os.environ["PLONK_TPU_PALLAS_MSM"] = "1"


def bench_onepass_ntt(log_n=19, batch=6):
    """One-kernel whole transform vs the five-step fused path (the
    prover's 8n stack shape: batch ~6 transforms at 8n)."""
    from plonk_tpu.ops import fused_ntt as FN
    M = MontField(SCALED_FR)
    n = 1 << log_n
    w = SCALED_FR.root_of_unity(n)
    rng = np.random.default_rng(0)
    x = M.encode(np.asarray(rng.integers(0, M.p, size=(batch, n),
                                         dtype=np.uint32)))
    f1 = jax.jit(lambda v: FN.fused_ntt_1k(M, v, w))
    f5 = jax.jit(lambda v: FN.fused_ntt(M, v, w))
    out1, out5 = f1(x), f5(x)
    ok = bool(jnp.array_equal(out1, out5))
    i1 = jax.jit(lambda v: FN.fused_intt_1k(M, v, w))
    i5 = jax.jit(lambda v: FN.fused_intt(M, v, w))
    iok = bool(jnp.array_equal(i1(out1), i5(out5)))
    print(json.dumps({
        "onepass_fwd_ms": round(timeit(f1, x) * 1000, 3),
        "fivestep_fwd_ms": round(timeit(f5, x) * 1000, 3),
        "onepass_inv_ms": round(timeit(i1, out1) * 1000, 3),
        "fivestep_inv_ms": round(timeit(i5, out5) * 1000, 3),
        "log_n": log_n, "batch": batch,
        "parity_fwd": ok, "parity_inv": iok}), flush=True)
    assert ok and iok, "onepass parity failed on device"


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "ntt"):
    bench_fused_ntt()
if which in ("all", "ntt1k"):
    bench_onepass_ntt()
if which in ("all", "pallasmsm"):
    bench_pallas_commit(16)
if which in ("all", "msm"):
    # NOTE: "gather" mode faults the TPU at 2^16 (905MB table + per-element
    # gather) — keep it out of the prove lane so it cannot wedge the chip.
    ctx = bench_commit_paths(16)
if which == "prove":
    ctx = bench_commit_paths(16, modes=("select",))
    bench_prover(ctx, 16)
if which == "prove3":
    # round-3 kernels: onepass NTT prims + pallas commit (the defaults)
    ctx = PS.scaled_new(1 << 16)
    bench_prover(ctx, 16)


def bench_mxu_ntt(log_n=20):
    from plonk_tpu.ops import mxu_ntt as MX
    from plonk_tpu.ops import ntt as N
    M = MontField(BABYBEAR)
    n = 1 << log_n
    w = BABYBEAR.root_of_unity(n)
    rng = np.random.default_rng(0)
    x = M.encode(np.asarray(rng.integers(0, M.p, size=n, dtype=np.uint32)))
    f1 = jax.jit(lambda v: MX.mxu_ntt(M, v, w))
    f2 = jax.jit(lambda v: MX.mxu_ntt_natural(M, v, w))
    out = f2(x)
    ref = jax.jit(lambda v: N.ntt(M, v, w, layout="simple"))(x)
    ok = bool(jnp.array_equal(out, ref))
    f3 = jax.jit(lambda v: MX.mxu_intt(M, MX.mxu_ntt(M, v, w), w))
    rt_ok = bool(jnp.array_equal(f3(x), x))
    print(json.dumps({
        "mxu_transposed_ms": round(timeit(f1, x) * 1000, 3),
        "mxu_natural_ms": round(timeit(f2, x) * 1000, 3),
        "mxu_roundtrip_ms": round(timeit(f3, x) * 1000, 3),
        "parity_ok": ok, "roundtrip_ok": rt_ok,
        "mxu_natural_elems_per_s": round(n / timeit(f2, x), 0),
    }), flush=True)


if which == "mxu":
    bench_mxu_ntt()


def bench_mxu2_ntt(log_n=19, batch=6):
    """Fused-VMEM MXU NTT (ops/pallas_mxu_ntt.py) vs plain-XLA MXU and
    the one-pass roll kernel at the prover's 8n stack shape; asserts
    real-chip parity (the gate for mxu2 becoming a prover default)."""
    from plonk_tpu.ops import mxu_ntt as MX
    from plonk_tpu.ops import pallas_mxu_ntt as PMX
    from plonk_tpu.ops import fused_ntt as FN
    M = MontField(SCALED_FR)
    n = 1 << log_n
    w = SCALED_FR.root_of_unity(n)
    rng = np.random.default_rng(0)
    x = M.encode(np.asarray(rng.integers(0, M.p, size=(batch, n),
                                         dtype=np.uint32)))
    fp = jax.jit(lambda v: PMX.mxu_ntt_pallas(M, v, w))
    fx = jax.jit(lambda v: MX.mxu_ntt(M, v, w))
    f1 = jax.jit(lambda v: FN.fused_ntt_1k(M, v, w))
    outp, outx = fp(x), fx(x)
    ok = bool(jnp.array_equal(outp, outx))
    ip = jax.jit(lambda v: PMX.mxu_intt_pallas(M, v, w))
    ix = jax.jit(lambda v: MX.mxu_intt(M, v, w))
    iok = bool(jnp.array_equal(ip(outp), ix(outx)))
    print(json.dumps({
        "mxu2_fwd_ms": round(timeit(fp, x) * 1000, 3),
        "mxu_xla_fwd_ms": round(timeit(fx, x) * 1000, 3),
        "onepass_fwd_ms": round(timeit(f1, x) * 1000, 3),
        "mxu2_inv_ms": round(timeit(ip, outp) * 1000, 3),
        "mxu_xla_inv_ms": round(timeit(ix, outx) * 1000, 3),
        "log_n": log_n, "batch": batch,
        "parity_fwd": ok, "parity_inv": iok}), flush=True)
    assert ok and iok, "mxu2 parity failed on device"


if which == "mxu2":
    bench_mxu2_ntt()


def bench_field_side(log_n=16):
    """Field-side pipeline only (commits skipped) for each NTT prim set."""
    import os as _os
    _os.environ["PLONK_TPU_PROFILE_SKIP_COMMITS"] = "1"
    n = 1 << log_n
    ctx = PS.scaled_new(n)
    sel, copies, a, b, c = square_chain_circuit(SCALED_FR.p, n)
    ch = np.array([1111, 2222, 3333, 4444, 5555], dtype=np.uint32)
    rnd = np.arange(1, 10, dtype=np.uint32)
    argsj = tuple(jnp.asarray(x) for x in (sel, copies, a, b, c))
    for name, prims in [("blocked", PS.default_prims()),
                        ("fused", PS.fused_prims()),
                        ("onepass", PS.onepass_prims()),
                        ("mxu", PS.mxu_prims()),
                        ("mxu2", PS.mxu2_prims())]:
        try:
            fn = jax.jit(lambda c_, r_, pr=prims: PS.prove_scaled(
                ctx, *argsj, c_, r_, prims=pr))
            dt = timeit(lambda: fn(ch, rnd), reps=5)
            print(json.dumps({"field_side_prims": name, "log_n": log_n,
                              "ms": round(dt * 1000, 2)}), flush=True)
        except Exception as e:
            print(f"{name} failed: {str(e)[:150]}", flush=True)


if which == "field":
    bench_field_side()


def bench_stages(log_n=16):
    """Ablation timing of the prover's round stages (commits skipped);
    differences between successive chains give per-stage costs. Every
    number includes the ~2.9 ms dispatch floor once."""
    import os as _os
    _os.environ["PLONK_TPU_PROFILE_SKIP_COMMITS"] = "1"
    n = 1 << log_n
    ctx = PS.scaled_new(n)
    sel, copies, a, b, c = square_chain_circuit(SCALED_FR.p, n)
    ch = np.array([1111, 2222, 3333, 4444, 5555], dtype=np.uint32)
    rnd = np.arange(1, 10, dtype=np.uint32)
    argsj = tuple(jnp.asarray(x) for x in (sel, copies, a, b, c))
    prims = PS.default_prims()
    Fr = ctx.Fr

    def enc(chv):
        e = Fr.encode(jnp.asarray(chv, jnp.uint32))
        return [e[i] for i in range(5)]

    # circuit-fixed preprocessing runs once (the per-proof pipeline is
    # what the chains measure, matching make_prover's runtime shape)
    prej = jax.jit(lambda s, c: PS.precompute_circuit(ctx, s, c, prims))(
        argsj[0], argsj[1])
    prej = jax.tree_util.tree_map(jax.block_until_ready, prej)
    wit = argsj[2:]

    def chain1(chv, rnv):
        st = PS._stage_prep(ctx, *wit, rnv, prims, prej)
        return st["a_x"], st["satisfied"]

    def chain2(chv, rnv):
        al, be, ga, z, v = enc(chv)
        st = PS._stage_prep(ctx, *wit, rnv, prims, prej)
        z_x, ok = PS._stage_grand_product(ctx, st, be, ga, prims)
        return z_x, ok

    def chain3(chv, rnv):
        al, be, ga, z, v = enc(chv)
        st = PS._stage_prep(ctx, *wit, rnv, prims, prej)
        z_x, ok = PS._stage_grand_product(ctx, st, be, ga, prims)
        q3 = PS._stage_quotient(ctx, st, z_x, al, be, ga, prims)
        return q3["t_x"], q3["t_tail_zero"]

    def chain4(chv, rnv):
        al, be, ga, z, v = enc(chv)
        st = PS._stage_prep(ctx, *wit, rnv, prims, prej)
        z_x, ok = PS._stage_grand_product(ctx, st, be, ga, prims)
        q3 = PS._stage_quotient(ctx, st, z_x, al, be, ga, prims)
        q5 = PS._stage_openings(ctx, st, q3, z_x, al, be, ga, z, v)
        return q5["w_z_x_quo"], q5["rem1"]

    for name, fn in [("prep", chain1), ("(+)grand_product", chain2),
                     ("(+)quotient", chain3), ("(+)openings", chain4)]:
        jf = jax.jit(fn)
        dt = timeit(lambda: jf(ch, rnd), reps=5)
        print(json.dumps({"stage_chain": name,
                          "ms": round(dt * 1000, 2)}), flush=True)


if which == "stages":
    bench_stages()


def bench_openings_ablation(log_n=16):
    """Sub-ablation inside the openings stage."""
    import os as _os
    _os.environ["PLONK_TPU_PROFILE_SKIP_COMMITS"] = "1"
    from plonk_tpu.ops import poly as Poly
    from plonk_tpu.models.plonk_scaled import _peval_fast
    n = 1 << log_n
    ctx = PS.scaled_new(n)
    sel, copies, a, b, c = square_chain_circuit(SCALED_FR.p, n)
    ch = np.array([1111, 2222, 3333, 4444, 5555], dtype=np.uint32)
    rnd = np.arange(1, 10, dtype=np.uint32)
    argsj = tuple(jnp.asarray(x) for x in (sel, copies, a, b, c))
    prims = PS.default_prims()
    Fr = ctx.Fr
    prej2 = jax.jit(lambda s_, c_: PS.precompute_circuit(
        ctx, s_, c_, prims))(argsj[0], argsj[1])
    prej2 = jax.tree_util.tree_map(jax.block_until_ready, prej2)
    wit2 = argsj[2:]

    def base(chv, rnv):
        e = Fr.encode(jnp.asarray(chv, jnp.uint32))
        al, be, ga, z, v = (e[i] for i in range(5))
        st = PS._stage_prep(ctx, *wit2, rnv, prims, prej2)
        z_x, _ = PS._stage_grand_product(ctx, st, be, ga, prims)
        q3 = PS._stage_quotient(ctx, st, z_x, al, be, ga, prims)
        return st, q3, z_x, (al, be, ga, z, v)

    def evals_only(chv, rnv):
        st, q3, z_x, (al, be, ga, z, v) = base(chv, rnv)
        outs = [_peval_fast(Fr, st["a_x"], z),
                _peval_fast(Fr, st["b_x"], z),
                _peval_fast(Fr, st["c_x"], z),
                _peval_fast(Fr, st["s_sigma_1"], z),
                _peval_fast(Fr, st["s_sigma_2"], z),
                _peval_fast(Fr, q3["t_x"], z),
                _peval_fast(Fr, q3["z_omega_x"], z),
                _peval_fast(Fr, q3["l_1_x"], z)]
        return jnp.stack(outs)

    def one_divide(chv, rnv):
        st, q3, z_x, (al, be, ga, z, v) = base(chv, rnv)
        q, rem = Poly.divide_by_linear(Fr, z_x, z)
        return q, rem

    def full(chv, rnv):
        st, q3, z_x, (al, be, ga, z, v) = base(chv, rnv)
        q5 = PS._stage_openings(ctx, st, q3, z_x, al, be, ga, z, v)
        return q5["w_z_x_quo"], q5["rem1"]

    for name, fn in [("quotient_base", lambda c_, r_: base(c_, r_)[1]["t_x"]),
                     ("(+)8 pevals", evals_only),
                     ("(+)1 divide", one_divide),
                     ("full openings", full)]:
        jf = jax.jit(fn)
        dt = timeit(lambda: jf(ch, rnd), reps=5)
        print(json.dumps({"openings_chain": name,
                          "ms": round(dt * 1000, 2)}), flush=True)


if which == "open":
    bench_openings_ablation()


def bench_wb_sweep(log_n=16):
    from plonk_tpu.ops import fixed_base as FB
    import os as _os
    n = 1 << log_n
    ctx = PS.scaled_new(n)
    rng = np.random.default_rng(0)
    sc = jnp.asarray(rng.integers(0, SCALED_FR.p, size=(9, n + 6),
                                  dtype=np.uint32))
    for wb in (5, 6, 7, 9):
        _os.environ["PLONK_TPU_FB_WB"] = str(wb)
        for attr in ("_fb_tables",):
            if hasattr(ctx, attr):
                object.__delattr__(ctx, attr)
        t0 = time.perf_counter()
        tbl = PS.fixed_base_table(ctx)
        build = time.perf_counter() - t0
        fn = jax.jit(lambda tx, ty, ti, s: FB.msm_fixed_base_many(
            ctx.Fq, FB.FixedBaseTable(tx, ty, ti, tbl.window_bits), s,
            mode="select"))
        dt = timeit(lambda s: fn(tbl.x, tbl.y, tbl.inf, s), sc)
        print(json.dumps({"wb": wb, "build_s": round(build, 1),
                          "commit9_ms": round(dt * 1000, 2)}), flush=True)


if which == "wb":
    bench_wb_sweep()


def bench_bn254_prover_ablate(log_n=10, reps=6):
    """BN254 prover stage ablation at 2^log_n gates: times the full
    compile-once prover (precompute_bn254 tables threaded), the prover
    with commits stubbed (field side only), and the 9-commit MSM alone —
    the production-curve sibling of the `stages` lane."""
    from plonk_tpu.models import plonk_bn254 as PB
    from plonk_tpu.utils.params import BN254_FR
    R = BN254_FR.p
    n = 1 << log_n
    rng = np.random.default_rng(0)

    def words_vec(vals):
        return np.stack([np.array([(int(v) >> (16 * k)) & 0xFFFF
                                   for k in range(16)], dtype=np.uint32)
                         for v in vals])

    t0 = time.perf_counter()
    ctx = PB.bn254_setup(n, rolled=True)
    print(f"setup: {time.perf_counter()-t0:.1f}s", flush=True)
    a = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(n)]
    b = [int.from_bytes(rng.bytes(31), "little") % R for _ in range(n)]
    c = [(x * y) % R for x, y in zip(a, b)]
    sel = np.zeros((5, n, 16), dtype=np.uint32)
    sel[3] = words_vec([1] * n)
    sel[2] = words_vec([R - 1] * n)
    copies = np.stack([
        np.stack([np.full(n, t), np.arange(1, n + 1)], axis=-1)
        for t in range(3)]).astype(np.int32)
    aw, bw, cw = words_vec(a), words_vec(b), words_vec(c)
    ch = words_vec([111111, 222222, 333333, 444444, 555555])
    rnd = words_vec(list(range(17, 26)))
    aj, bj, cj = (jnp.asarray(v) for v in (aw, bw, cw))

    # field side only: commit_many stubbed to identity points
    def stub_commits(coeffs):
        B = len(coeffs)
        z = jnp.zeros((B, 16), jnp.uint32)
        return PB.BigG1Affine(z, z, jnp.ones((B,), jnp.bool_))

    stub_prims = PB._local_prims(ctx)._replace(commit_many=stub_commits)
    for name, prims in (("full", None), ("field_only", stub_prims)):
        t0 = time.perf_counter()
        prover = PB.make_prover_bn254(ctx, sel, copies, prims=prims)
        out = prover(aj, bj, cj, ch, rnd)
        jax.block_until_ready(out)
        build = time.perf_counter() - t0
        dt = timeit(lambda: prover(aj, bj, cj, ch, rnd), reps=reps)
        print(json.dumps({"bn254_prove": name, "log_n": log_n,
                          "ms": round(dt * 1000, 2),
                          "compile_s": round(build, 1)}), flush=True)

    # commits alone (GLV batched MSM over the 9 coefficient vectors)
    sc = jnp.asarray(rng.integers(0, 1 << 16, size=(9, ctx.srs.length, 16),
                                  dtype=np.uint32))
    from plonk_tpu.ops import bigpoly as BPol
    cfn = jax.jit(lambda s: PB._commit_many(
        ctx, [ctx.Fr.encode(s[i]) for i in range(9)]))
    dt = timeit(lambda: cfn(sc), reps=reps)
    print(json.dumps({"bn254_commit9_glv_ms": round(dt * 1000, 2),
                      "log_n": log_n}), flush=True)


if which == "bn254prof":
    bench_bn254_prover_ablate(int(sys.argv[2]) if len(sys.argv) > 2 else 10)


def bench_bn254_msm(log_n=14):
    from plonk_tpu.ops import bigcurve as BC
    from plonk_tpu.ops.bigfield import BigMontField
    F = BigMontField(BC.BN254_FQ)
    L = 1 << log_n
    rng = np.random.default_rng(0)
    gx = jnp.broadcast_to(F.const(BC.BN254_G1_GEN[0]), (L, F.limbs))
    gy = jnp.broadcast_to(F.const(BC.BN254_G1_GEN[1]), (L, F.limbs))
    one = jnp.broadcast_to(F.const(1), (L, F.limbs))
    pts = BC.BigG1J(gx, gy, one)
    words = jnp.asarray(rng.integers(0, 1 << 16, size=(L, 16),
                                     dtype=np.uint32))
    fn = jax.jit(lambda p_, w_: BC.big_msm_pippenger(F, p_, w_,
                                                     window_bits=8))
    dt = timeit(lambda: fn(pts, words), reps=3)
    print(json.dumps({"bn254_msm_log_n": log_n,
                      "ms": round(dt * 1000, 2),
                      "points_per_s": round(L / dt, 1)}), flush=True)


if which == "bn254":
    bench_bn254_msm()


def bench_bn254_commit_paths(log_n=12, reps=6):
    """BN254 9-commitment sweep on device at 2^log_n gates: GLV
    Pippenger (round-3 default) vs XLA fixed-base select sweep vs the
    fused Pallas kernel (tile/wg sweep), ALL parity-checked against each
    other on device. The fixed-base table build/load time is reported
    separately (one-time per SRS, disk-cached)."""
    import os
    from plonk_tpu.models import plonk_bn254 as PB
    from plonk_tpu.ops import bigcurve as BC
    from plonk_tpu.ops.pallas_bigmsm import big_commit_many_pallas
    from plonk_tpu.utils.params import BN254_FR
    R = BN254_FR.p
    n = 1 << log_n
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    ctx = PB.bn254_setup(n, rolled=True)
    print(f"setup: {time.perf_counter()-t0:.1f}s", flush=True)
    Fr, Fq = ctx.Fr, ctx.Fq
    L = ctx.srs.length
    sc = jnp.asarray(rng.integers(0, 1 << 16, size=(9, L, 16),
                                  dtype=np.uint32))
    # clamp top words so scalars < r (top word of r is 0x3064)
    sc = sc.at[..., 15].set(sc[..., 15] & 0x0FFF)

    def affine_std(out):
        x, y, inf = BC.big_to_affine(Fq, out)
        return (np.asarray(Fq.decode(x)), np.asarray(Fq.decode(y)),
                np.asarray(inf))

    results = {}
    # distinct scalar sets per rep (rolled along the point axis keeps
    # them < r) — same-input reps can collapse in the tunnel (ADVICE r4)
    sc_vars = [jnp.roll(sc, i, axis=1) for i in range(reps + 1)]

    # GLV Pippenger (the round-3 path; ~3 s/rep at 2^12 and a long
    # compile — enable with PLONK_TPU_MICRO_GLV=1 for full-parity runs)
    if os.environ.get("PLONK_TPU_MICRO_GLV") == "1":
        cfn = jax.jit(lambda s: PB._commit_many(
            ctx, [Fr.encode(s[i]) for i in range(9)]))
        try:
            dt = timeit_varied(lambda s: cfn(s), sc_vars)
            out = cfn(sc)
            # _commit_many returns MONTGOMERY-form affine coords (the
            # prover decodes later) — decode before comparing (a round-4
            # probe chased a phantom "GLV mismatch" for hours over this)
            results["glv"] = (np.asarray(Fq.decode(out.x)),
                              np.asarray(Fq.decode(out.y)),
                              np.asarray(out.inf))
            print(json.dumps({"bn254_commit9": "glv_pippenger",
                              "ms": round(dt * 1000, 2)}), flush=True)
        except Exception as e:
            print(f"glv failed: {str(e)[:200]}", flush=True)

    # fixed-base table (build or disk load)
    t0 = time.perf_counter()
    tbl = PB.bn254_fixed_base_table(ctx)
    print(f"fb table wb={tbl.window_bits}: "
          f"{time.perf_counter()-t0:.1f}s "
          f"({tbl.x.nbytes*2/1e6:.0f} MB)", flush=True)

    # XLA select sweep: crashes the remote-compile helper (HTTP 500) at
    # 2^12 — opt-in only until fixed or removed (VERDICT r4 item 8)
    if os.environ.get("PLONK_TPU_MICRO_FBSELECT") == "1":
        fbfn = jax.jit(lambda t, s: BC.big_msm_fixed_base_many(Fq, t, s))
        try:
            dt = timeit_varied(lambda s: fbfn(tbl, s), sc_vars)
            out = fbfn(tbl, sc)
            results["fb_select"] = affine_std(out)
            print(json.dumps({"bn254_commit9": "fb_select",
                              "wb": tbl.window_bits,
                              "ms": round(dt * 1000, 2)}), flush=True)
        except Exception as e:
            print(f"fb_select failed: {str(e)[:200]}", flush=True)

    # tile=512 fails the remote device compile (round-4), and every v2
    # config beyond t128/wg2 dies in the remote compile helper (HTTP
    # 500, round-5 sweep) — each failure burns ~6 min, so the default
    # list is the v1 anchor + the one live v2 config; override with
    # PLONK_TPU_MICRO_CFGS="tile:wg:v1|v2,..."
    env_cfgs = os.environ.get("PLONK_TPU_MICRO_CFGS")
    if env_cfgs:
        cfgs = []
        for part in env_cfgs.split(","):
            t_, w_, v_ = part.split(":")
            cfgs.append((int(t_), int(w_), v_))
    else:
        cfgs = [(128, 4, "v1"), (128, 4, "v3"), (128, 2, "v3"),
                (128, 8, "v3")]
    for tile, wg, ver in cfgs:
        tag = f"pallas_{ver}_t{tile}_wg{wg}" if ver != "v1" \
            else f"pallas_t{tile}_wg{wg}"
        pfn = jax.jit(lambda t, s, ti=tile, w=wg, v=ver:
                      big_commit_many_pallas(Fq, t, s, tile=ti, wg=w,
                                             version=v))
        try:
            dt = timeit_varied(lambda s: pfn(tbl, s), sc_vars)
            out = pfn(tbl, sc)
            results[tag] = affine_std(out)
            print(json.dumps({"bn254_commit9": tag,
                              "ms": round(dt * 1000, 2)}), flush=True)
        except Exception as e:
            print(f"{tag} failed: {str(e)[:200]}", flush=True)

    # parity across everything that ran, vs the v1 anchor (itself
    # bit-checked against GLV/fb_select in round 4)
    base_key = ("pallas_t128_wg4" if "pallas_t128_wg4" in results
                else next(iter(results), None))
    if base_key is not None:
        base = results[base_key]
        for k, (x, y, inf) in results.items():
            if k == base_key:
                continue
            ok = (np.array_equal(x, base[0])
                  and np.array_equal(y, base[1])
                  and np.array_equal(inf, base[2]))
            print(f"parity {k} vs {base_key}: {ok}", flush=True)
            assert ok, k


if which == "bigmsm":
    bench_bn254_commit_paths(int(sys.argv[2]) if len(sys.argv) > 2 else 12)


def bench_bigntt(log_n=14, batch=10, reps=6):
    """Pallas 16-limb fused NTT (ops/pallas_bigntt.py) vs the XLA
    big_ntt on device: forward + inverse timing at the BN254 prover's
    (batch, 4n) coset stack shape, with scrambled-layout parity checks
    (forward == big_ntt permuted; round trip == identity)."""
    from plonk_tpu.ops.bigfield import BigMontField, big_ntt
    from plonk_tpu.ops.fused_ntt import scrambled_perm
    from plonk_tpu.ops.pallas_bigntt import big_fused_ntt, big_fused_intt
    from plonk_tpu.utils.params import BN254_FR

    F = BigMontField(BN254_FR, rolled=True)
    n = 1 << log_n
    w = BN254_FR.root_of_unity(n)
    rng = np.random.default_rng(0)
    base = [int.from_bytes(rng.bytes(40), "little") % F.p
            for _ in range(1024)]
    x = jnp.tile(F.array(base), (batch, n // 1024, 1))
    x_vars = [jnp.roll(x, i, axis=1) for i in range(reps + 1)]

    ffn = jax.jit(lambda v: big_fused_ntt(F, v, w))
    ifn = jax.jit(lambda v: big_fused_intt(F, v, w))
    rfn = jax.jit(lambda v: big_ntt(F, v, w))

    # parity on ONE batch lane (full-stack compare is a big host pull)
    got = np.asarray(ffn(x)[0])
    ref = np.asarray(rfn(x[:1])[0])
    perm = np.asarray(scrambled_perm(n))
    assert np.array_equal(got, ref[perm]), "bigntt fwd parity on device"
    back = np.asarray(ifn(ffn(x))[0])
    assert np.array_equal(back, np.asarray(x[0])), "bigntt roundtrip"
    print("parity fwd+roundtrip ok", flush=True)

    for tag, fn in (("pallas_fwd", ffn), ("pallas_inv", ifn),
                    ("xla_fwd", rfn)):
        dt = timeit_varied(fn, x_vars)
        print(json.dumps({
            "bigntt": tag, "log_n": log_n, "batch": batch,
            "ms": round(dt * 1000, 2),
            "melems_per_s": round(batch * n / dt / 1e6, 2)}), flush=True)


if which == "bigntt":
    bench_bigntt(int(sys.argv[2]) if len(sys.argv) > 2 else 14)
