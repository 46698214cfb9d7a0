"""create_proof: the PlonKish KZG prover (SHPLONK multiopen, Blake2b FS).

Role of halo2-axiom's `create_proof::<KZGCommitmentScheme, ProverSHPLONK,
Challenge255, _, Blake2bWrite, _>` (SURVEY.md §2.9, §3.3). Hot paths run on
device: column IFFTs / extended-coset FFTs (ops/ntt.py), Pippenger MSM
commitments (ops/ec_device.py), the quotient evaluation as batched
Montgomery-limb tensor math, grand products via log-depth associative scans +
one batched inversion, and the SHPLONK multiopen in *evaluation form* on H
(every polynomial division becomes a pointwise multiply by a batched inverse;
the only host-scalar work left is the tiny <=deg-3 interpolations and the
lookup permuted-pair sort).

Protocol phases (must mirror verifier.py exactly):
  vk hash + instances -> advice commitments -> theta -> lookup permuted
  commitments -> beta, gamma -> permutation + lookup Z commitments -> random
  poly -> y -> quotient pieces -> x -> evals -> SHPLONK(v, w; H; u; Q).
"""

from __future__ import annotations

import os as _os
import random as _random
import time as _time

import jax
import jax.numpy as jnp

_DEBUG = _os.environ.get("HALO2_PROVER_DEBUG") == "1"


def _stage(label: str, t0: float) -> float:
    now = _time.time()
    if _DEBUG:
        import sys as _sys

        print(f"[prover] {label}: {now - t0:.2f}s", file=_sys.stderr, flush=True)
    return now

from ..gates.circuit import BaseCircuitBuilder, PhysicalCircuit
from ..utils.fields import FR_BN254
from .keygen import BLINDING_FACTORS, DELTA, ProvingKey
from .kzg import ParamsKZG
from .poly import domain as get_domain
from .protocol import (
    P,
    divide_by_linear,
    group_queries,
    lagrange_interpolate,
    perm_chunks,
    point_values,
    poly_eval,
    query_plan,
    usable_row_count,
    vanishing_poly,
)
from .transcript import Blake2bWrite


def _pad(col: list[int], n: int) -> list[int]:
    return list(col) + [0] * (n - len(col))


def _blind(col: list[int], n: int, rng) -> list[int]:
    """Fill the last BLINDING_FACTORS rows with random values (zk blinding)."""
    out = _pad(col, n)
    for r in range(n - BLINDING_FACTORS, n):
        out[r] = rng.randrange(P)
    return out


def _grand_product(numer: list[int], denom: list[int], u: int, n: int, rng) -> list[int]:
    """z[0]=1, z[i+1]=z[i]*numer[i]/denom[i] for i<u; blinding rows random."""
    # batch invert denominators
    pref = [1] * (u + 1)
    for i in range(u):
        pref[i + 1] = pref[i] * denom[i] % P
    inv_all = pow(pref[u], -1, P)
    inv = [0] * u
    for i in range(u - 1, -1, -1):
        inv[i] = pref[i] * inv_all % P
        inv_all = inv_all * denom[i] % P
    z = [0] * n
    z[0] = 1
    for i in range(u):
        z[i + 1] = z[i] * numer[i] % P * inv[i] % P
    for r in range(u + 1, n):
        z[r] = rng.randrange(P)
    return z


def _permute_pair(a_vals: list[int], s_vals: list[int], u: int, n: int, rng):
    """halo2 permute_expression_pair: sort input; align table (lookup/prover.rs)."""
    a_sorted = sorted(a_vals[:u])
    s_multiset: dict[int, int] = {}
    for v in s_vals[:u]:
        s_multiset[v] = s_multiset.get(v, 0) + 1
    s_out: list[int | None] = [None] * u
    for i, v in enumerate(a_sorted):
        if i == 0 or v != a_sorted[i - 1]:
            cnt = s_multiset.get(v, 0)
            if cnt == 0:
                raise ValueError(f"lookup failure: value {v} not in table")
            s_multiset[v] = cnt - 1
            s_out[i] = v
    leftovers = []
    for v, c in s_multiset.items():
        leftovers.extend([v] * c)
    it = iter(leftovers)
    for i in range(u):
        if s_out[i] is None:
            s_out[i] = next(it)
    a_p = _blind(a_sorted, n, rng)
    s_p = _blind([int(v) for v in s_out], n, rng)
    return a_p, s_p


def create_proof(
    params: ParamsKZG,
    pk: ProvingKey,
    builder_or_circuit,
    instances: list[list[int]] | None = None,
    seed: int = 0,
) -> bytes:
    vk = pk.vk
    k = vk.k
    n = 1 << k
    dom = get_domain(k)
    u = usable_row_count(n)
    rng = _random.Random(("create-proof-blinding", seed).__repr__())
    _t = _time.time()

    if isinstance(builder_or_circuit, BaseCircuitBuilder):
        circuit: PhysicalCircuit = builder_or_circuit.synthesize()
    else:
        circuit = builder_or_circuit
    if instances is None:
        instances = circuit.instances
    assert not vk.uses_q_lookup, (
        "single-advice-column q_lookup circuits are not supported by the real "
        "prover; allocate a lookup advice column (num_advice >= 2)"
    )

    # --- column values (host ints, length n) ---
    phase0 = circuit.phases[0] if circuit.phases else None
    advice_vals = []
    for i in range(vk.num_advice):
        col = phase0.columns[i] if phase0 and i < len(phase0.columns) else []
        advice_vals.append(_blind(col, n, rng))
    lookup_vals = []
    lkcols = circuit.lookup_cols[0] if circuit.lookup_cols else []
    for j in range(vk.num_lookup):
        col = lkcols[j] if j < len(lkcols) else []
        lookup_vals.append(_blind(col, n, rng))
    instance_vals = [_pad(col, n) for col in instances]
    while len(instance_vals) < vk.num_instance:
        instance_vals.append([0] * n)

    # --- transcript init ---
    tr = Blake2bWrite()
    tr.common_bytes(vk.hash())
    for col in instances:
        for v in col:
            tr.common_scalar(v)

    # --- helpers: commit a Lagrange-basis column on device ---
    poly_cache: dict[str, object] = {}  # label -> device coeffs [n,16]

    def to_coeffs(vals: list[int]):
        return dom.lagrange_to_coeff(dom.pack(vals))

    def commit_vals(label: str, vals: list[int]):
        coeffs = to_coeffs(vals)
        poly_cache[label] = coeffs
        poly_cache["__lag_" + label] = dom.pack(vals)
        return params.commit_dev(coeffs, dom.df)

    _t = _stage("setup", _t)
    # --- 1. advice commitments ---
    for i, vals in enumerate(advice_vals):
        tr.write_point(commit_vals(f"adv{i}", vals))
    for j, vals in enumerate(lookup_vals):
        tr.write_point(commit_vals(f"lkcol{j}", vals))

    _t = _stage("advice commits", _t)
    tr.squeeze_challenge()  # theta (single-expression lookups; structural)

    # --- 2. lookup permuted columns ---
    lookup_permuted = []
    for j in range(vk.num_lookup):
        a_p, s_p = _permute_pair(lookup_vals[j], pk.table_col, u, n, rng)
        lookup_permuted.append((a_p, s_p))
        tr.write_point(commit_vals(f"lk{j}_a", a_p))
        tr.write_point(commit_vals(f"lk{j}_s", s_p))

    _t = _stage("lookup permuted", _t)
    beta = tr.squeeze_challenge()
    gamma = tr.squeeze_challenge()

    # --- 3. permutation grand products (device) ---
    perm_cols = vk.perm_columns
    chunks = perm_chunks(len(perm_cols))
    df = dom.df
    W = dom.omega_pows_dev()
    gamma_h = dom.const_h(gamma)
    row_idx = jnp.arange(n)

    def lag_dev(label: str, vals: list[int]):
        key = "__lag_" + label
        if key not in poly_cache:
            poly_cache[key] = dom.pack(vals)
        return poly_cache[key]

    def col_lag(ref):
        if ref.kind == "advice":
            return lag_dev(f"adv{ref.index}", advice_vals[ref.index])
        if ref.kind == "lookup":
            return lag_dev(f"lkcol{ref.index}", lookup_vals[ref.index])
        if ref.kind == "fixed":
            return lag_dev(f"fix{ref.index}", pk.fixed_cols[ref.index])
        if ref.kind == "instance":
            return lag_dev(f"inst{ref.index}", instance_vals[ref.index])
        raise ValueError(ref.kind)

    def grand_product_dev(numer_dev, denom_dev):
        """z = exclusive prefix prod of numer/denom on rows < u; random blind."""
        ratio = df.mont_mul(numer_dev, df.batch_inv(denom_dev))
        one_h = dom.const_h(1)
        mask = (row_idx < u)[:, None]
        ratio = jnp.where(mask, ratio, one_h)
        pref = dom.prefix_prod(ratio)
        z = jnp.concatenate([one_h[:1], pref[:-1]], axis=0)
        blind = dom.pack([rng.randrange(P) for _ in range(n - u - 1)])
        return z.at[u + 1 :].set(blind)

    def commit_lag(label: str, lag):
        coeffs = dom.lagrange_to_coeff(lag)
        poly_cache[label] = coeffs
        poly_cache["__lag_" + label] = lag
        return params.commit_dev(coeffs, df)

    last_z_end = 1
    for j, (s, e) in enumerate(chunks):
        numer = dom.const_h(1)
        denom = dom.const_h(1)
        for ci in range(s, e):
            v = col_lag(perm_cols[ci])
            sigma = lag_dev(f"sigma{ci}", pk.perm_values[ci])
            bd = beta * pow(DELTA, ci, P) % P
            id_side = df.add(df.add(v, df.mont_mul(W, dom.pack([bd])[0])), gamma_h)
            sig_side = df.add(
                df.add(v, df.mont_mul(sigma, dom.pack([beta])[0])), gamma_h
            )
            numer = df.mont_mul(numer, id_side)
            denom = df.mont_mul(denom, sig_side)
        # Z(wX)*sigma_side = Z(X)*id_side -> z[i+1] = z[i] * id[i] / sigma[i]
        z = grand_product_dev(numer, denom)
        if j > 0:
            scaled = df.mont_mul(z, dom.pack([last_z_end])[0])
            z = jnp.where((row_idx <= u)[:, None], scaled, z)
        last_z_end = dom.unpack(z[u])[0]
        tr.write_point(commit_lag(f"permz{j}", z))

    # --- lookup grand products (device) ---
    for j in range(vk.num_lookup):
        a_p, s_p = lookup_permuted[j]
        a_in = lag_dev(f"lkcol{j}", lookup_vals[j])
        t_in = lag_dev("table", pk.table_col)
        beta_h = dom.const_h(beta)
        numer = df.mont_mul(df.add(a_in, beta_h), df.add(t_in, gamma_h))
        denom = df.mont_mul(
            df.add(lag_dev(f"lk{j}_a", a_p), beta_h),
            df.add(lag_dev(f"lk{j}_s", s_p), gamma_h),
        )
        z = grand_product_dev(numer, denom)
        tr.write_point(commit_lag(f"lk{j}_zl", z))

    _t = _stage("grand products", _t)
    # --- 4. vanishing random poly ---
    random_coeffs = [rng.randrange(P) for _ in range(n)]
    random_commit = params.commit(random_coeffs)
    poly_cache["random"] = dom.pack(random_coeffs)
    tr.write_point(random_commit)

    y = tr.squeeze_challenge()

    # --- 5. quotient on the extended coset (device) ---
    h_coeffs_dev = _compute_quotient(
        dom, vk, pk, poly_cache, instance_vals, beta, gamma, y, u
    )
    # split into CS_DEGREE-1 = 3 pieces of n coefficients
    pieces_dev = [h_coeffs_dev[i * n : (i + 1) * n] for i in range(3)]
    for piece in pieces_dev:
        tr.write_point(params.commit_dev(piece, dom.df))

    _t = _stage("quotient", _t)
    x = tr.squeeze_challenge()
    pts = point_values(x, k)

    # --- 6. evals (device: batched power-dot at each point) ---
    plan = query_plan(vk)

    def coeffs_dev_of(label: str):
        if label in poly_cache:
            return poly_cache[label]
        if label.startswith("sigma"):
            c = to_coeffs(pk.perm_values[int(label[5:])])
        elif label.startswith("fix"):
            c = to_coeffs(pk.fixed_cols[int(label[3:])])
        elif label.startswith("sel"):
            c = to_coeffs(pk.selectors[int(label[3:])])
        elif label == "table":
            c = to_coeffs(pk.table_col)
        elif label == "h":
            # combined h poly: sum x^{n i} h_i (device RLC of the 3 pieces)
            xc = pow(x, n, P)
            acc = pieces_dev[0]
            scale = xc
            for piece in pieces_dev[1:]:
                sc = dom.pack([scale])[0]
                acc = dom.df.add(acc, dom.df.mont_mul(piece, sc))
                scale = scale * xc % P
            c = acc
        else:
            raise KeyError(label)
        poly_cache[label] = c
        return c

    # evaluate every opened poly at every needed point in one batched call/pt
    by_point: dict[str, list[str]] = {}
    for label, pts_labels in plan:
        for pl in pts_labels:
            by_point.setdefault(pl, []).append(label)
    evals: dict[str, dict[str, int]] = {label: {} for label, _ in plan}
    for pl, labels in by_point.items():
        stack = jnp.stack([coeffs_dev_of(lb) for lb in labels])
        vals = dom.eval_many_at(stack, pts[pl])
        for lb, ev in zip(labels, vals):
            evals[lb][pl] = ev
    for label, pts_labels in plan:
        for pl in pts_labels:
            tr.write_scalar(evals[label][pl])

    _t = _stage("evals", _t)
    # --- 7. SHPLONK multiopen (evaluation form on H; single IFFTs) ---
    v = tr.squeeze_challenge()
    w_ch = tr.squeeze_challenge()
    groups = group_queries(plan)
    df = dom.df
    W = dom.omega_pows_dev()  # [n,16] domain points (Montgomery)

    def lagrange_dev_of(label: str):
        # Lagrange (evaluation) form on H of an opened poly
        key = "__lag_" + label
        if key in poly_cache:
            return poly_cache[key]
        e = dom.coeff_to_lagrange(coeffs_dev_of(label))
        poly_cache[key] = e
        return e

    g_eval_forms = []
    g_evals = []  # per group: {point_label: scalar eval}
    for pts_labels, labels in groups:
        acc = None
        ge = {pl: 0 for pl in pts_labels}
        vpow = 1
        for label in labels:
            e = lagrange_dev_of(label)
            sc = dom.pack([vpow])[0]
            term = df.mont_mul(e, sc)
            acc = term if acc is None else df.add(acc, term)
            for pl in pts_labels:
                ge[pl] = (ge[pl] + vpow * evals[label][pl]) % P
            vpow = vpow * v % P
        g_eval_forms.append(acc)
        g_evals.append(ge)

    # H = sum_j w^j (g_j - r_j) / Z_{S_j}, computed pointwise on H
    # (S_j points are challenge-derived, never in H, so Z_{S_j} != 0 on H)
    h_acc = None
    wpow = 1
    r_coeffs_per_group = []
    for (pts_labels, _), gdev, ge in zip(groups, g_eval_forms, g_evals):
        pvals = [pts[pl] for pl in pts_labels]
        r = lagrange_interpolate(pvals, [ge[pl] for pl in pts_labels])
        r_coeffs_per_group.append(r)
        # r on H via Horner (deg <= 3)
        r_dev = dom.const_h(r[-1])
        for cv in reversed(r[:-1]):
            r_dev = df.add(df.mont_mul(r_dev, W), dom.const_h(cv))
        num = df.sub(gdev, r_dev)
        # Z_S on H
        zs = None
        for s in pvals:
            f = df.sub(W, dom.const_h(s))
            zs = f if zs is None else df.mont_mul(zs, f)
        inv_zs = df.batch_inv(zs)
        quot = df.mont_mul(num, inv_zs)
        term = df.mont_mul(quot, dom.pack([wpow])[0])
        h_acc = term if h_acc is None else df.add(h_acc, term)
        wpow = wpow * w_ch % P
    h_open_coeffs = dom.lagrange_to_coeff(h_acc)
    h_open_commit = params.commit_dev(h_open_coeffs, df)
    tr.write_point(h_open_commit)

    u_ch = tr.squeeze_challenge()

    # L = sum_j w^j Z_{T\S_j}(u) (g_j - r_j(u)) - Z_T(u) H   (on H)
    all_points = sorted({pts[pl] for plan_pts, _ in groups for pl in plan_pts})
    zt_u = poly_eval(vanishing_poly(all_points), u_ch)
    L_acc = None
    wpow = 1
    for (pts_labels, _), gdev, r in zip(groups, g_eval_forms, r_coeffs_per_group):
        pvals = [pts[pl] for pl in pts_labels]
        others = [pt for pt in all_points if pt not in pvals]
        z_other_u = poly_eval(vanishing_poly(others), u_ch)
        r_u = poly_eval(r, u_ch)
        scale = wpow * z_other_u % P
        term = df.sub(gdev, dom.const_h(r_u))
        term = df.mont_mul(term, dom.pack([scale])[0])
        L_acc = term if L_acc is None else df.add(L_acc, term)
        wpow = wpow * w_ch % P
    L_acc = df.sub(L_acc, df.mont_mul(h_acc, dom.pack([zt_u])[0]))
    # Q = L / (X - u), pointwise on H (u not in H)
    inv_xu = df.batch_inv(df.sub(W, dom.const_h(u_ch)))
    q_evals = df.mont_mul(L_acc, inv_xu)
    q_coeffs = dom.lagrange_to_coeff(q_evals)
    q_commit = params.commit_dev(q_coeffs, df)
    tr.write_point(q_commit)

    _t = _stage("shplonk", _t)
    return tr.finalize()


def _compute_quotient(dom, vk, pk, poly_cache, instance_vals, beta, gamma, y, u):
    """All constraint expressions on the 4n coset, y-RLC'd, / Z_H. Device math.

    Must follow protocol.expected_quotient_eval's ordering exactly. Expressions
    are folded into the accumulator as they are produced (acc = acc*y + e) so
    peak memory stays at a few extended columns.
    """
    n = dom.n

    # extended evals of every needed poly
    ext: dict[str, object] = {}

    def ext_of(label: str, coeffs=None, vals=None):
        if label in ext:
            return ext[label]
        if coeffs is None:
            if vals is not None:
                coeffs = dom.lagrange_to_coeff(dom.pack(vals))
            elif label.startswith("inst"):
                coeffs = dom.lagrange_to_coeff(dom.pack(instance_vals[int(label[4:])]))
            else:
                coeffs = poly_cache[label]
        e = dom.coeff_to_extended(coeffs)
        ext[label] = e
        return e

    # lagrange selector polys l_0, l_last, l_active on the coset
    l0_vals = [0] * n
    l0_vals[0] = 1
    llast_vals = [0] * n
    llast_vals[u] = 1
    lactive_vals = [1 if r < u else 0 for r in range(n)]
    l0_e = ext_of("__l0", vals=l0_vals)
    llast_e = ext_of("__llast", vals=llast_vals)
    lactive_e = ext_of("__lactive", vals=lactive_vals)

    one_e = dom.const_ext(1)

    # incremental y-RLC accumulator (Horner): acc = acc * y + expr
    state = {"acc": dom.const_ext(0)}
    y_e = dom.const_ext(y)

    def emit(e):
        state["acc"] = dom.add(dom.mul(state["acc"], y_e), e)

    # 1. gates
    for i in range(vk.num_advice):
        q_e = ext_of(f"sel{i}", vals=pk.selectors[i])
        a_e = ext_of(f"adv{i}")
        a_w = dom.rotate_ext(a_e, 1)
        a_w2 = dom.rotate_ext(a_e, 2)
        a_w3 = dom.rotate_ext(a_e, 3)
        expr = dom.sub(dom.add(a_e, dom.mul(a_w, a_w2)), a_w3)
        emit(dom.mul(q_e, expr))

    # 2. permutation
    perm_cols = vk.perm_columns
    chunks = perm_chunks(len(perm_cols))
    if chunks:
        z_exts = [ext_of(f"permz{j}") for j in range(len(chunks))]
        emit(dom.mul(l0_e, dom.sub(one_e, z_exts[0])))
        zl = z_exts[-1]
        emit(dom.mul(llast_e, dom.sub(dom.mul(zl, zl), zl)))
        for j in range(1, len(chunks)):
            zprev_rot = dom.rotate_ext(z_exts[j - 1], u)
            emit(dom.mul(l0_e, dom.sub(z_exts[j], zprev_rot)))

        def col_ext(ref):
            if ref.kind == "advice":
                return ext_of(f"adv{ref.index}")
            if ref.kind == "lookup":
                return ext_of(f"lkcol{ref.index}")
            if ref.kind == "fixed":
                return ext_of(f"fix{ref.index}", vals=pk.fixed_cols[ref.index])
            if ref.kind == "instance":
                return ext_of(f"inst{ref.index}")
            raise ValueError(ref.kind)

        # X on the coset: values g * w_ext^i -> poly X has coeffs [0, 1]
        x_poly = dom.coeff_to_extended(dom.pack([0, 1]))
        beta_e = dom.const_ext(beta)
        gamma_e = dom.const_ext(gamma)
        for j, (s, e) in enumerate(chunks):
            left = dom.rotate_ext(z_exts[j], 1)
            right = z_exts[j]
            for ci in range(s, e):
                v_e = col_ext(perm_cols[ci])
                sigma_e = ext_of(f"sigma{ci}", vals=pk.perm_values[ci])
                left = dom.mul(left, dom.add(dom.add(v_e, dom.mul(beta_e, sigma_e)), gamma_e))
                d_ci = pow(DELTA, ci, P)
                id_term = dom.mul(dom.const_ext(beta * d_ci % P), x_poly)
                right = dom.mul(right, dom.add(dom.add(v_e, id_term), gamma_e))
            emit(dom.mul(lactive_e, dom.sub(left, right)))

    # 3. lookups
    for j in range(vk.num_lookup):
        z_e = ext_of(f"lk{j}_zl")
        z_w = dom.rotate_ext(z_e, 1)
        a_p = ext_of(f"lk{j}_a")
        a_p_prev = dom.rotate_ext(a_p, -1)
        s_p = ext_of(f"lk{j}_s")
        a_in = ext_of(f"lkcol{j}")
        t_in = ext_of("table", vals=pk.table_col)
        beta_e = dom.const_ext(beta)
        gamma_e = dom.const_ext(gamma)
        emit(dom.mul(l0_e, dom.sub(one_e, z_e)))
        emit(dom.mul(llast_e, dom.sub(dom.mul(z_e, z_e), z_e)))
        left = dom.mul(dom.mul(z_w, dom.add(a_p, beta_e)), dom.add(s_p, gamma_e))
        right = dom.mul(dom.mul(z_e, dom.add(a_in, beta_e)), dom.add(t_in, gamma_e))
        emit(dom.mul(lactive_e, dom.sub(left, right)))
        emit(dom.mul(l0_e, dom.sub(a_p, s_p)))
        emit(
            dom.mul(dom.mul(lactive_e, dom.sub(a_p, s_p)), dom.sub(a_p, a_p_prev))
        )

    h_ext = dom.divide_by_vanishing(state["acc"])
    h_coeffs_dev = dom.extended_to_coeff(h_ext)
    # degree must be < 3n (device check, no host unpack of 4n coeffs)
    import jax.numpy as jnp

    top_zero = bool(jnp.all(h_coeffs_dev[3 * n :] == 0))
    assert top_zero, "quotient degree overflow"
    return h_coeffs_dev[: 3 * n]
