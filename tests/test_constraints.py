"""Circuit frontend parity (src/constraints-test.c): the expression compiler
must reproduce the reference's exact variable interning order and gate list,
and the witness checker must accept/reject the same assignments."""
import numpy as np
import pytest

from plonk_tpu.utils.params import HF17
from plonk_tpu.ops.field import Field
from plonk_tpu.models import constraints as CS

F = Field(HF17)
P = 17


def test_expr_compiler_pythagoras():
    """(a*a + b*b) - (c*c) bound to zero: exact var map + gates
    (src/constraints-test.c:7-105; printf output is the golden)."""
    a, b, c = CS.Var("a"), CS.Var("b"), CS.Var("c")
    expr = (a * a + b * b) - (c * c)
    vars, gates, root = CS.compile_expression(P, expr)

    assert vars.names == ["a", "v1", "b", "v3", "v4", "c", "v6", "v7"]
    assert root == 7
    assert gates.num_gates == 6
    mul, add, sub = CS.gate_mul_a_b(P), CS.gate_sum_a_b(P), CS.gate_sub_a_b(P)
    bind = CS.gate_bind_to_zero(P)
    assert gates.gates == [mul, mul, add, mul, sub, bind]
    assert gates.a_indices == [0, 2, 1, 5, 4, CS.UNUSED_INDEX]
    assert gates.b_indices == [0, 2, 3, 5, 6, CS.UNUSED_INDEX]
    assert gates.c_indices == [1, 3, 4, 6, 7, 7]


def test_expr_constants_interned():
    """Constants become const_<v> pseudo-variables (src/constraints.h:277-282),
    reduced mod p, deduplicated."""
    e = CS.Var("x") * CS.Const(21)  # 21 % 17 == 4
    vars, gates, root = CS.compile_expression(P, e, bind_zero=False)
    assert vars.names == ["x", "const_4", "v2"]
    e2 = CS.Const(4) + CS.Const(4)
    vars2, gates2, _ = CS.compile_expression(P, e2, bind_zero=False)
    assert vars2.names == ["const_4", "v1"]
    assert gates2.a_indices == [0] and gates2.b_indices == [0]


def test_gate_constructors():
    """Gate selector values (src/constraints.h:89-112)."""
    assert CS.gate_sum_a_b(P) == CS.Gate(1, 1, 16, 0, 0)
    assert CS.gate_sub_a_b(P) == CS.Gate(1, 16, 16, 0, 0)
    assert CS.gate_mul_a_b(P) == CS.Gate(0, 0, 16, 1, 0)
    assert CS.gate_bind_a(P, 5) == CS.Gate(1, 0, 0, 0, 5)
    assert CS.gate_bind_to_zero(P) == CS.Gate(0, 0, 1, 0, 0)


def test_constraints_satisfy():
    """c = a + b accepted / rejected (src/constraints-test.c:108-160)."""
    cons = CS.make_constraints(
        P, [CS.gate_sum_a_b(P)],
        c_a=[(CS.COPYOF_A, 1)], c_b=[(CS.COPYOF_B, 1)],
        c_c=[(CS.COPYOF_C, 1)])
    good = CS.Assignments(np.array([2]), np.array([3]), np.array([5]))
    bad = CS.Assignments(np.array([2]), np.array([3]), np.array([6]))
    assert bool(CS.satisfies(F, cons, good))
    assert not bool(CS.satisfies(F, cons, bad))


def test_copy_permutation_construction():
    """Extension: automatic sigma construction produces valid cycles — every
    slot maps within its variable's occurrence set and cycles cover all
    occurrences."""
    a, b, c = CS.Var("a"), CS.Var("b"), CS.Var("c")
    expr = (a * a + b * b) - (c * c)
    vars, gates, root = CS.compile_expression(P, expr)
    c_a, c_b, c_c = CS.build_copy_permutation(gates)
    n = gates.num_gates
    cols = {CS.COPYOF_A: gates.a_indices, CS.COPYOF_B: gates.b_indices,
            CS.COPYOF_C: gates.c_indices}
    perm = {CS.COPYOF_A: c_a, CS.COPYOF_B: c_b, CS.COPYOF_C: c_c}
    # the permutation must preserve the variable of each slot
    for col, arr in perm.items():
        for row in range(n):
            v = cols[col][row]
            tcol, trow = int(arr[row][0]), int(arr[row][1]) - 1
            if v == CS.UNUSED_INDEX:
                assert (tcol, trow) == (col, row)
            else:
                assert cols[tcol][trow] == v, (col, row)
    # witness satisfying the permutation: equal wire values across cycles
    witness = CS.compute_witness(P, gates, vars, {"a": 3, "b": 4, "c": 5})
    cons = CS.gate_list_to_constraints(P, gates)
    assert bool(CS.satisfies(F, cons, witness))


def test_compute_witness_pythagoras():
    a, b, c = CS.Var("a"), CS.Var("b"), CS.Var("c")
    expr = (a * a + b * b) - (c * c)
    vars, gates, _ = CS.compile_expression(P, expr)
    w = CS.compute_witness(P, gates, vars, {"a": 3, "b": 4, "c": 5})
    # 9 + 16 = 25 -> v4 = 25 % 17 = 8; v6 = 25 % 17 = 8; v7 = 0
    assert list(w.c) == [9, 16, (9 + 16) % 17, 25 % 17, 0, 0]


def test_frontend_to_prover_end_to_end():
    """Expression frontend -> padded tensors -> scaled prover + verifier:
    the automated pipeline the reference leaves manual (src/plonk-test.c
    hand-writes everything). Uses the scaled field: in F17 a domain of 8
    leaves only one nontrivial coset, so toy PLONK caps at n = 4 — too
    small for the 6-gate pythagoras circuit."""
    import jax
    import jax.numpy as jnp
    from plonk_tpu.models.constraints import frontend_circuit
    from plonk_tpu.models import plonk_scaled as PS
    from plonk_tpu.utils.params import SCALED_FR

    R = SCALED_FR.p
    a, b, c = CS.Var("a"), CS.Var("b"), CS.Var("c")
    expr = (a * a + b * b) - (c * c)
    n = 8  # 6 gates padded to the next power of two
    sel, copies, wa, wb, wc = frontend_circuit(R, expr,
                                               {"a": 3, "b": 4, "c": 5}, n)
    assert sel.shape == (5, n) and copies.shape == (3, n, 2)
    ctx = PS.scaled_new(n, secret=111222333)
    ch = np.array([101, 202, 303, 404, 505], dtype=np.uint32)
    rnd = np.arange(1, 10, dtype=np.uint32)
    proof, diags = jax.jit(lambda ch, rnd: PS.prove_scaled(
        ctx, jnp.asarray(sel.astype(np.uint32)), jnp.asarray(copies),
        jnp.asarray(wa), jnp.asarray(wb), jnp.asarray(wc), ch, rnd))(
            jnp.asarray(ch), jnp.asarray(rnd))
    assert bool(diags.all_ok())
    vk = PS.make_vk_scaled(ctx, sel, copies)
    assert PS.verify_scaled(ctx, vk, proof, ch)
    # wrong witness rejected
    _, _, wa2, wb2, wc2 = frontend_circuit(R, expr,
                                           {"a": 3, "b": 4, "c": 6}, n)
    _, diags2 = PS.prove_scaled(ctx, jnp.asarray(sel.astype(np.uint32)),
                                jnp.asarray(copies), jnp.asarray(wa2),
                                jnp.asarray(wb2), jnp.asarray(wc2), ch, rnd)
    assert not bool(diags2.satisfied)
