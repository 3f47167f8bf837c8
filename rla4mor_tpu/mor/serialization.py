"""Checkpoint / resume for sketched-reductor state.

The reference keeps all state in live Python objects with no serialization
(SURVEY §5 "Checkpoint / resume: none"). Here the sketched state — which is
exactly (seeds, sketched basis, affine residual stacks, output stack, basis
parameters) — round-trips through a single ``.npz`` file, so long greedy
runs can resume and ROMs can ship without the FOM.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from rla4mor_tpu.core.affine import AffineDense
from rla4mor_tpu.core.parameters import (
    Coefficient,
    ConstantCoefficient,
    ProductCoefficient,
    ProjectionCoefficient,
)


def _coeff_to_spec(c: Coefficient):
    if isinstance(c, ConstantCoefficient):
        return {"kind": "const", "value": c.value}
    if isinstance(c, ProjectionCoefficient):
        return {"kind": "proj", "key": c.key, "index": c.index}
    if isinstance(c, ProductCoefficient):
        return {"kind": "prod", "factors": [_coeff_to_spec(f) for f in c.factors]}
    raise TypeError(f"cannot serialize coefficient {c!r}")


def _coeff_from_spec(spec) -> Coefficient:
    if spec["kind"] == "const":
        return ConstantCoefficient(spec["value"])
    if spec["kind"] == "proj":
        return ProjectionCoefficient(spec["key"], spec["index"])
    if spec["kind"] == "prod":
        return ProductCoefficient(
            tuple(_coeff_from_spec(f) for f in spec["factors"])
        )
    raise ValueError(spec)


def save_affine(d: dict, prefix: str, op: Optional[AffineDense]) -> None:
    if op is None:
        return
    d[f"{prefix}__stack"] = np.asarray(op.stack)
    d[f"{prefix}__coeffs"] = json.dumps(
        [_coeff_to_spec(c) for c in op.coefficients]
    )


def load_affine(d, prefix: str) -> Optional[AffineDense]:
    if f"{prefix}__stack" not in d:
        return None
    coeffs = [
        _coeff_from_spec(s) for s in json.loads(str(d[f"{prefix}__coeffs"]))
    ]
    return AffineDense(jnp.asarray(d[f"{prefix}__stack"]), tuple(coeffs))


# Version of the canonical seed->operator derivation (ops/seeding.py tile
# grid + fold_in schedule). Bump whenever the derivation changes: a stored
# seed then names a DIFFERENT embedding, and resuming would silently mix
# sketches from two operators (review round-2).
SEED_DERIVATION = "tile-v1"


def _embedding_fingerprint(e) -> str:
    """Stable descriptor of an embedding OPERATOR identity: class name +
    every scalar dataclass field (seed, range/source dims, block sizes,
    dist, ...). The seed alone is not enough — e.g. the hardware-PRNG
    embedding is determined by (seed, range_dim, block_rows, dist), so a
    resume with a different block_rows regenerates a different Omega
    under the same seed (round-2 review finding)."""
    import dataclasses as _dc

    fields = {}
    if _dc.is_dataclass(e):
        for f in _dc.fields(e):
            v = getattr(e, f.name)
            if isinstance(v, (int, float, str, bool)):
                fields[f.name] = v
    else:  # non-dataclass embeddings: fall back to the seed
        fields["seed"] = getattr(e, "seed", None)
    return json.dumps({"class": type(e).__name__, **dict(sorted(
        fields.items()))})


def _save_mu_basis(d: dict, mu_basis) -> None:
    if not mu_basis:
        return
    keys = sorted(mu_basis[0].keys())
    d["mu_basis_keys"] = json.dumps(keys)
    for kname in keys:
        d[f"mu_basis__{kname}"] = np.stack(
            [np.asarray(m[kname]) for m in mu_basis]
        )


def _load_mu_basis(d) -> list:
    if "mu_basis_keys" not in d:
        return []
    keys = json.loads(str(d["mu_basis_keys"]))
    count = d[f"mu_basis__{keys[0]}"].shape[0]
    return [
        {k: jnp.asarray(d[f"mu_basis__{k}"][i]) for k in keys}
        for i in range(count)
    ]


def _check_embeddings(d, reductor) -> None:
    """Seed + fingerprint guards shared by the plain and padded loaders."""
    for name, emb in (("primal", reductor.embedding_primal),
                      ("online", reductor.embedding_online)):
        if f"seed_{name}" in d and int(d[f"seed_{name}"]) != emb.seed:
            raise ValueError(
                f"checkpoint seed_{name}={int(d[f'seed_{name}'])} != "
                f"reductor's {emb.seed}: the stored sketches came from a "
                "different embedding"
            )
        fkey = f"fingerprint_{name}"
        if fkey in d and str(d[fkey]) != _embedding_fingerprint(emb):
            raise ValueError(
                f"checkpoint {name} embedding {str(d[fkey])} does not "
                f"match the reductor's {_embedding_fingerprint(emb)}: "
                "same-seed operators with different structural parameters "
                "are different operators"
            )


def save_reductor(reductor, path) -> None:
    """Persist the sketched state of a SketchedReductor."""
    d: dict = {
        "seed_derivation": SEED_DERIVATION,
        "srb": np.asarray(reductor.srb),
        "rb": np.asarray(reductor.rb),
        "seed_primal": reductor.embedding_primal.seed,
        "seed_online": reductor.embedding_online.seed,
        "fingerprint_primal": _embedding_fingerprint(
            reductor.embedding_primal),
        "fingerprint_online": _embedding_fingerprint(
            reductor.embedding_online),
        "projection": reductor.projection,
    }
    save_affine(d, "residual_lhs", reductor.residual_lhs)
    save_affine(d, "residual_rhs", reductor.residual_rhs)
    save_affine(d, "output", reductor.output_functional)
    _save_mu_basis(d, reductor.mu_basis)
    np.savez_compressed(path, **d)


def save_padded_reductor(reductor, path) -> None:
    """Persist a ``PaddedSketchedReductor``'s fixed-shape offline state
    (the TPU no-retrace mode): the padded buffers, fill counter, seeds and
    basis parameters — a greedy run on the remote-compile platform can
    stop and resume without losing its one compiled program's cache."""
    st = reductor.state
    d: dict = {
        "seed_derivation": SEED_DERIVATION,
        "pad__srb": np.asarray(st.srb),
        "pad__res_lhs": np.asarray(st.res_lhs),
        "pad__out": np.asarray(st.out),
        "pad__rb": np.asarray(st.rb),
        "pad__ncols": np.asarray(st.ncols),
        "seed_primal": reductor.embedding_primal.seed,
        "seed_online": reductor.embedding_online.seed,
        "fingerprint_primal": _embedding_fingerprint(
            reductor.embedding_primal),
        "fingerprint_online": _embedding_fingerprint(
            reductor.embedding_online),
        "projection": reductor.projection,
    }
    save_affine(d, "residual_rhs", reductor.residual_rhs)
    _save_mu_basis(d, reductor.mu_basis)
    np.savez_compressed(path, **d)


def load_padded_reductor_state(reductor, path) -> None:
    """Restore state saved by :func:`save_padded_reductor` into a
    freshly-constructed ``PaddedSketchedReductor`` (same FOM, embeddings
    and r_max)."""
    d = np.load(Path(path), allow_pickle=False)
    _check_seed_derivation(d)
    _check_embeddings(d, reductor)
    _check_projection(d, reductor)
    st = reductor.state
    assert d["pad__srb"].shape == st.srb.shape, (
        "r_max / sketch dims mismatch", d["pad__srb"].shape, st.srb.shape
    )
    reductor.state = type(st)(
        srb=jnp.asarray(d["pad__srb"]),
        res_lhs=jnp.asarray(d["pad__res_lhs"]),
        out=jnp.asarray(d["pad__out"]),
        rb=jnp.asarray(d["pad__rb"]),
        ncols=jnp.asarray(d["pad__ncols"]),
    )
    mu_basis = _load_mu_basis(d)
    if mu_basis:
        reductor.mu_basis = mu_basis


def save_instationary_reductor(reductor, path) -> None:
    """Persist an ``InstationaryReductor``: its whole resumable state is
    the R-orthonormal basis plus the embedding seed (``reduce()`` rebuilds
    everything else from the FOM), so a POD-greedy run can resume."""
    d: dict = {
        "seed_derivation": SEED_DERIVATION,
        "rb": np.asarray(reductor.rb),
    }
    if reductor.embedding is not None:
        d["seed_embedding"] = reductor.embedding.seed
    np.savez_compressed(path, **d)


def load_instationary_reductor_state(reductor, path) -> None:
    """Restore state saved by :func:`save_instationary_reductor` into a
    freshly-constructed reductor over the same FOM."""
    d = np.load(Path(path), allow_pickle=False)
    _check_seed_derivation(d)
    if "seed_embedding" in d and reductor.embedding is not None:
        stored = int(d["seed_embedding"])
        if stored != reductor.embedding.seed:
            raise ValueError(
                f"checkpoint embedding seed {stored} != reductor's "
                f"{reductor.embedding.seed}: estimates would come from a "
                "different sketch operator"
            )
    reductor.rb = jnp.asarray(d["rb"])


def save_primal_dual_reductor(reductor, path) -> None:
    """Persist an ``InstationaryPrimalDualReductor``: both R-orthonormal
    bases plus the two embedding seeds (``reduce()`` rebuilds every
    reduced quantity from the FOM), so a goal-oriented POD-greedy run
    can resume."""
    d: dict = {
        "seed_derivation": SEED_DERIVATION,
        "rb": np.asarray(reductor.primal.rb),
        "rb_dual": np.asarray(reductor.rb_dual),
        "output_kind": getattr(reductor, "output_kind", "final"),
    }
    if reductor.primal.embedding is not None:
        d["seed_embedding"] = reductor.primal.embedding.seed
    if reductor.embedding_dual is not None:
        d["seed_embedding_dual"] = reductor.embedding_dual.seed
    np.savez_compressed(path, **d)


def load_primal_dual_reductor_state(reductor, path) -> None:
    """Restore state saved by :func:`save_primal_dual_reductor` into a
    freshly-constructed reductor over the same FOM."""
    d = np.load(Path(path), allow_pickle=False)
    _check_seed_derivation(d)
    stored_kind = str(d["output_kind"]) if "output_kind" in d else "final"
    own_kind = getattr(reductor, "output_kind", "final")
    if stored_kind != own_kind:
        raise ValueError(
            f"checkpoint was written under output_kind={stored_kind!r} but "
            f"the reductor uses {own_kind!r}: rb_dual holds POD modes of a "
            "different adjoint problem"
        )
    for key, emb in (("seed_embedding", reductor.primal.embedding),
                     ("seed_embedding_dual", reductor.embedding_dual)):
        if key in d and emb is not None and int(d[key]) != emb.seed:
            raise ValueError(
                f"checkpoint {key} {int(d[key])} != reductor's "
                f"{emb.seed}: estimates would come from a different "
                "sketch operator"
            )
    reductor.primal.rb = jnp.asarray(d["rb"])
    reductor.rb_dual = jnp.asarray(d["rb_dual"])


def save_wave_reductor(reductor, path) -> None:
    """Persist a ``WaveReductor`` (same shape as the instationary one:
    R-orthonormal basis + embedding seed)."""
    d: dict = {
        "seed_derivation": SEED_DERIVATION,
        "rb": np.asarray(reductor.rb),
    }
    if reductor.embedding is not None:
        d["seed_embedding"] = reductor.embedding.seed
    np.savez_compressed(path, **d)


def load_wave_reductor_state(reductor, path) -> None:
    """Restore state saved by :func:`save_wave_reductor`."""
    d = np.load(Path(path), allow_pickle=False)
    _check_seed_derivation(d)
    if "seed_embedding" in d and reductor.embedding is not None:
        stored = int(d["seed_embedding"])
        if stored != reductor.embedding.seed:
            raise ValueError(
                f"checkpoint embedding seed {stored} != reductor's "
                f"{reductor.embedding.seed}: estimates would come from a "
                "different sketch operator"
            )
    reductor.rb = jnp.asarray(d["rb"])


# -- standalone ROM shipping (serve without the FOM or reductor) --------
# The online models are pytrees of AffineDense stacks + scalars; a .npz
# of (affine blocks, aux scalars) round-trips them exactly, so a trained
# ROM deploys with no FOM, basis, or embedding in the runtime image.
# Reconstruction to full states still needs the basis — ship the
# reductor checkpoint alongside when reconstruct() is part of serving.

def save_rom(rom, path) -> None:
    """Persist a :class:`StationaryROM`, :class:`InstationaryROM`,
    :class:`WaveROM` or a corrected-output composite standalone."""
    np.savez_compressed(
        path, seed_derivation=SEED_DERIVATION, **_rom_fields(rom)
    )


def _rom_fields(rom) -> dict:
    """ROM -> flat npz-ready field dict (shared by the top-level save and
    the composite nesting, so neither pays an intermediate npz pass)."""
    from rla4mor_tpu.models.instationary import InstationaryROM
    from rla4mor_tpu.models.instationary_primal_dual import (
        InstationaryCorrectedOutputROM,
    )
    from rla4mor_tpu.models.stationary import StationaryROM
    from rla4mor_tpu.models.wave import WaveROM
    from rla4mor_tpu.mor.primal_dual import CorrectedOutputROM
    from rla4mor_tpu.mor.semilinear_reductor import (
        SemilinearInstationaryROM,
        SemilinearROM,
    )

    d: dict = {}

    def arr(key, x):
        if x is not None:
            d[key] = np.asarray(x)

    if isinstance(rom, StationaryROM):
        d["kind"] = "stationary"
        d["aux"] = np.asarray([rom.ls, rom.ls_rcond], np.float64)
        save_affine(d, "lhs", rom.lhs)
        save_affine(d, "rhs", rom.rhs)
        save_affine(d, "out", rom.output_functional)
        if rom.error_estimator is not None:
            save_affine(d, "est_lhs", rom.error_estimator.lhs)
            save_affine(d, "est_rhs", rom.error_estimator.rhs)
    elif isinstance(rom, InstationaryROM):
        d["kind"] = "instationary"
        d["aux"] = np.asarray([rom.dt, rom.nt, rom.time_theta], np.float64)
        arr("mass_r", rom.mass_r)
        arr("u0_r", rom.u0_r)
        arr("est_mass", rom.est_mass)
        save_affine(d, "lhs", rom.lhs)
        save_affine(d, "rhs", rom.rhs_r)
        save_affine(d, "est_lhs", rom.est_lhs)
        save_affine(d, "est_rhs", rom.est_rhs)
        save_affine(d, "out", rom.output_functional)
    elif isinstance(rom, WaveROM):
        d["kind"] = "wave"
        d["aux"] = np.asarray([rom.dt, rom.nt, rom.beta, rom.gamma],
                              np.float64)
        arr("mass_r", rom.mass_r)
        arr("u0_r", rom.u0_r)
        arr("v0_r", rom.v0_r)
        arr("est_mass", rom.est_mass)
        save_affine(d, "lhs", rom.lhs)
        save_affine(d, "rhs", rom.rhs_r)
        save_affine(d, "est_lhs", rom.est_lhs)
        save_affine(d, "est_rhs", rom.est_rhs)
        save_affine(d, "out", rom.output_functional)
    elif isinstance(rom, CorrectedOutputROM):
        d["kind"] = "corrected_output"
        d["aux"] = np.asarray([], np.float64)
        _save_rom_into(d, "pr", rom.rom_pr)
        _save_rom_into(d, "du", rom.rom_du)
        save_affine(d, "rhs_z", rom.rhs_z)
        save_affine(d, "op_zv", rom.op_zv)
    elif isinstance(rom, InstationaryCorrectedOutputROM):
        d["kind"] = "instationary_corrected_output"
        d["aux"] = np.asarray([], np.float64)
        d["output_kind"] = rom.output_kind
        _save_rom_into(d, "pr", rom.rom_pr)
        arr("mass_zz", rom.mass_zz)
        arr("mass_zv", rom.mass_zv)
        arr("est_mass_z", rom.est_mass_z)
        save_affine(d, "lhs_zz", rom.lhs_zz)
        save_affine(d, "l_z", rom.l_z)
        save_affine(d, "rhs_z", rom.rhs_z)
        save_affine(d, "op_zv", rom.op_zv)
        save_affine(d, "est_lhs_z", rom.est_lhs_z)
        save_affine(d, "est_l", rom.est_l)
    elif isinstance(rom, SemilinearROM):
        d["kind"] = "semilinear"
        d["aux"] = np.asarray(
            [rom.reaction_scale, rom.newton_tol, rom.max_newton],
            np.float64)
        d["nonlinearity"] = rom.nonlinearity
        save_affine(d, "lhs", rom.lhs)
        arr("rhs_hat", rom.rhs_hat)
        arr("W", rom.W)
        arr("Pv", rom.Pv)
        arr("out_row", rom.output_row)
        _save_semilinear_est(d, rom.error_estimator)
    elif isinstance(rom, SemilinearInstationaryROM):
        d["kind"] = "semilinear_instationary"
        d["aux"] = np.asarray(
            [rom.reaction_scale, rom.nt, rom.dt, rom.v_row_sup],
            np.float64)
        d["nonlinearity"] = rom.nonlinearity
        save_affine(d, "lhs", rom.lhs)
        arr("M_hat", rom.M_hat)
        arr("rhs_hat", rom.rhs_hat)
        arr("W", rom.W)
        arr("Pv", rom.Pv)
        arr("out_row", rom.output_row)
        _save_semilinear_est(d, rom.error_estimator)
    else:
        raise TypeError(f"save_rom: unsupported ROM type {type(rom)!r}")
    return d


def _save_semilinear_est(d: dict, est) -> None:
    if est is None:
        return
    d["est_gram"] = np.asarray(est.gram)
    d["est_aux"] = np.asarray(
        [float(est.sketched), est.mass_scale, est.n_interior], np.float64)
    if est.Pv_res is not None:
        d["est_pv_res"] = np.asarray(est.Pv_res)
        d["est_pred_res"] = np.asarray(est.pred_res)


def _load_semilinear_est(d):
    from rla4mor_tpu.mor.semilinear_reductor import (
        SemilinearResidualEstimator,
    )

    if "est_gram" not in d:
        return None
    sk, ms, ni = d["est_aux"]
    pv_res = jnp.asarray(d["est_pv_res"]) if "est_pv_res" in d else None
    pred = jnp.asarray(d["est_pred_res"]) if "est_pred_res" in d else None
    return SemilinearResidualEstimator(
        jnp.asarray(d["est_gram"]), pv_res, pred, bool(sk),
        mass_scale=float(ms), n_interior=int(ni))


def _save_rom_into(d: dict, prefix: str, rom) -> None:
    """Nested-ROM serialization (the corrected-output composites): the
    component ROM's fields merge in under key prefixes."""
    for k, v in _rom_fields(rom).items():
        d[f"{prefix}__{k}"] = v


def _load_rom_from(d, prefix: str):
    keys = d.files if hasattr(d, "files") else list(d.keys())
    sub = {k[len(prefix) + 2:]: d[k] for k in keys
           if k.startswith(prefix + "__")}
    return _rom_from_fields(sub)


def load_rom(path):
    """Load a ROM saved by :func:`save_rom` (type restored from the
    file)."""
    src = path if hasattr(path, "read") else Path(path)
    d = np.load(src, allow_pickle=False)
    _check_seed_derivation(d)
    return _rom_from_fields(d)


def _rom_from_fields(d):
    kind = str(d["kind"])

    def arr(key):
        return jnp.asarray(d[key]) if key in d else None

    if kind == "stationary":
        from rla4mor_tpu.models.stationary import (
            ResidualErrorEstimator,
            StationaryROM,
        )

        est = None
        est_lhs = load_affine(d, "est_lhs")
        if est_lhs is not None:
            est = ResidualErrorEstimator(est_lhs, load_affine(d, "est_rhs"))
        ls, ls_rcond = d["aux"]
        return StationaryROM(
            load_affine(d, "lhs"), load_affine(d, "rhs"),
            output_functional=load_affine(d, "out"),
            error_estimator=est, ls=bool(ls), ls_rcond=float(ls_rcond),
        )
    if kind == "instationary":
        from rla4mor_tpu.models.instationary import InstationaryROM

        dt, nt, th = d["aux"]
        return InstationaryROM(
            arr("mass_r"), load_affine(d, "lhs"), load_affine(d, "rhs"),
            arr("u0_r"), float(dt), int(nt),
            est_mass=arr("est_mass"), est_lhs=load_affine(d, "est_lhs"),
            est_rhs=load_affine(d, "est_rhs"),
            output_functional=load_affine(d, "out"), time_theta=float(th),
        )
    if kind == "wave":
        from rla4mor_tpu.models.wave import WaveROM

        dt, nt, beta, gamma = d["aux"]
        return WaveROM(
            arr("mass_r"), load_affine(d, "lhs"), load_affine(d, "rhs"),
            arr("u0_r"), arr("v0_r"), float(dt), int(nt), float(beta),
            float(gamma),
            est_mass=arr("est_mass"), est_lhs=load_affine(d, "est_lhs"),
            est_rhs=load_affine(d, "est_rhs"),
            output_functional=load_affine(d, "out"),
        )
    if kind == "corrected_output":
        from rla4mor_tpu.mor.primal_dual import CorrectedOutputROM

        return CorrectedOutputROM(
            _load_rom_from(d, "pr"), _load_rom_from(d, "du"),
            load_affine(d, "rhs_z"), load_affine(d, "op_zv"),
        )
    if kind == "instationary_corrected_output":
        from rla4mor_tpu.models.instationary_primal_dual import (
            InstationaryCorrectedOutputROM,
        )

        return InstationaryCorrectedOutputROM(
            _load_rom_from(d, "pr"), arr("mass_zz"),
            load_affine(d, "lhs_zz"), load_affine(d, "l_z"),
            load_affine(d, "rhs_z"), arr("mass_zv"),
            load_affine(d, "op_zv"), est_mass_z=arr("est_mass_z"),
            est_lhs_z=load_affine(d, "est_lhs_z"),
            est_l=load_affine(d, "est_l"),
            output_kind=(str(d["output_kind"])
                         if "output_kind" in d else "final"),
        )
    if kind == "semilinear":
        from rla4mor_tpu.mor.semilinear_reductor import SemilinearROM

        rs, ntol, mn = d["aux"]
        return SemilinearROM(
            load_affine(d, "lhs"), arr("rhs_hat"), arr("W"), arr("Pv"),
            arr("out_row"), _load_semilinear_est(d),
            nonlinearity=str(d["nonlinearity"]), reaction_scale=float(rs),
            newton_tol=float(ntol), max_newton=int(mn),
        )
    if kind == "semilinear_instationary":
        from rla4mor_tpu.mor.semilinear_reductor import (
            SemilinearInstationaryROM,
        )

        aux = np.asarray(d["aux"], np.float64)
        rs, nt, dt = aux[:3]
        # round-4 files have no v_row_sup slot: load as NaN (the
        # certified bound then demands an explicit v_row_sup=)
        v_sup = float(aux[3]) if aux.shape[0] > 3 else float("nan")
        return SemilinearInstationaryROM(
            load_affine(d, "lhs"), arr("M_hat"), arr("rhs_hat"),
            arr("W"), arr("Pv"), arr("out_row"), _load_semilinear_est(d),
            nonlinearity=str(d["nonlinearity"]), reaction_scale=float(rs),
            nt=int(nt), dt=float(dt), v_row_sup=v_sup,
        )
    raise ValueError(f"unknown ROM kind {kind!r}")


def _eim_interp_arrays(interp) -> dict:
    """EimInterpolant -> npz-ready field dict (one site; the mdeim
    round-trip reuses it so the two can never diverge)."""
    return dict(
        basis=np.asarray(interp.basis),
        points=np.asarray(interp.points),
        interp_matrix=np.asarray(interp.interp_matrix),
        triangular=np.asarray(interp.triangular),
        sup_errors=np.asarray(interp.sup_errors, np.float64),
        n_reserve=np.asarray(interp.n_reserve),
        snapshot_ids=np.asarray(interp.snapshot_ids, np.int64),
    )


def _eim_interp_from(d):
    from rla4mor_tpu.mor.eim import EimInterpolant

    return EimInterpolant(
        basis=jnp.asarray(d["basis"]),
        points=jnp.asarray(d["points"]),
        interp_matrix=jnp.asarray(d["interp_matrix"]),
        triangular=bool(d["triangular"]),
        sup_errors=tuple(d["sup_errors"].tolist()),
        n_reserve=int(d["n_reserve"]),
        snapshot_ids=tuple(int(j) for j in d["snapshot_ids"]),
    )


def save_eim_interpolant(interp, path) -> None:
    """``.npz`` round-trip of an :class:`rla4mor_tpu.mor.eim.EimInterpolant`
    (the EIM offline stage is the expensive part of a non-affine FOM —
    ship/resume it without retraining; the reference has no non-affine
    support at all)."""
    np.savez(Path(path), eim_version=np.asarray(1),
             **_eim_interp_arrays(interp))


def load_eim_interpolant(path):
    d = np.load(Path(path))
    assert int(d["eim_version"]) == 1, "unknown EIM checkpoint version"
    return _eim_interp_from(d)


def save_mdeim_operator(op, path) -> None:
    """``.npz`` round-trip of a :class:`rla4mor_tpu.mor.eim.MdeimOperator`
    (EIM interpolant + the shared CSR sparsity pattern)."""
    np.savez(
        Path(path),
        mdeim_version=np.asarray(1),
        indices=op.indices,
        indptr=op.indptr,
        shape=np.asarray(op.shape),
        **_eim_interp_arrays(op.interpolant),
    )


def load_mdeim_operator(path):
    from rla4mor_tpu.mor.eim import MdeimOperator

    d = np.load(Path(path))
    assert int(d["mdeim_version"]) == 1, "unknown MDEIM checkpoint version"
    return MdeimOperator(_eim_interp_from(d), d["indices"], d["indptr"],
                         tuple(int(s) for s in d["shape"]))


def _check_projection(d, reductor) -> None:
    stored = str(d["projection"]) if "projection" in d else None
    if stored is not None and stored != reductor.projection:
        raise ValueError(
            f"checkpoint was written under projection={stored!r} but the "
            f"reductor uses {reductor.projection!r}: resuming would switch "
            "the solve/estimate rule and online-seed schedule mid-run"
        )


def _check_seed_derivation(d) -> None:
    stored = str(d["seed_derivation"]) if "seed_derivation" in d else "pre-v1"
    if stored != SEED_DERIVATION:
        raise ValueError(
            f"checkpoint was written under seed derivation {stored!r} but "
            f"this build uses {SEED_DERIVATION!r}: the stored seeds would "
            "regenerate different embeddings than the ones that produced "
            "the saved sketches; re-run the offline stage"
        )


def load_reductor_state(reductor, path) -> None:
    """Restore sketched state saved by :func:`save_reductor` into a
    freshly-constructed reductor (FOM/embeddings must match)."""
    d = np.load(Path(path), allow_pickle=False)
    _check_seed_derivation(d)
    _check_embeddings(d, reductor)
    _check_projection(d, reductor)
    reductor.srb = jnp.asarray(d["srb"])
    reductor.rb = jnp.asarray(d["rb"])
    reductor.residual_lhs = load_affine(d, "residual_lhs")
    reductor.residual_rhs = load_affine(d, "residual_rhs")
    reductor.output_functional = load_affine(d, "output")
    mu_basis = _load_mu_basis(d)
    if mu_basis:
        reductor.mu_basis = mu_basis
