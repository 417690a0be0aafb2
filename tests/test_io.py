"""IO layer: sparse assembly + direct coarse solve, VTK, checkpoint, timing,
config (reference tests: tests/hyteg/dataexport+import/, tests/hyteg/Petsc/)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from hyteg_tpu.core.config import from_dict
from hyteg_tpu.core.timing import TimingTree
from hyteg_tpu.core.types import BoundaryCondition, DoFType, FLAG_INNER
from hyteg_tpu.functions.p1 import P1Space
from hyteg_tpu.io.checkpoint import CheckpointExporter, CheckpointImporter
from hyteg_tpu.io.sparse import DirectCoarseSolver, assemble_p1_csr, assemble_p2_csr
from hyteg_tpu.io.vtk import VTKOutput, write_domain_partitioning_vtk
from hyteg_tpu.mesh import meshinfo as mi
from hyteg_tpu.operators import forms
from hyteg_tpu.operators.p1_elementwise import P1ElementwiseOperator
from hyteg_tpu.primitives.storage import CellStorage


def test_assemble_matches_apply():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    sp = P1Space(storage, 2)
    op = P1ElementwiseOperator(sp, forms.laplace_form)
    A = assemble_p1_csr(op)
    from tests.test_operator import _from_blocks, _to_blocks

    rng = np.random.default_rng(0)
    v = rng.standard_normal(sp.num_global_dofs())
    got = _from_blocks(sp, op.apply_raw(_to_blocks(sp, v)))
    assert np.allclose(got, A @ v, rtol=1e-4, atol=1e-4)


def test_assemble_p2_spd():
    from hyteg_tpu.functions.p2 import P2Space
    from hyteg_tpu.operators.p2_elementwise import P2ElementwiseOperator

    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    p2 = P2Space(storage, 1)
    op = P2ElementwiseOperator(p2, "mass")
    M = assemble_p2_csr(op).toarray()
    assert np.allclose(M, M.T, atol=1e-12)
    w = np.linalg.eigvalsh(M)
    assert w.min() > 0


def test_direct_coarse_solver():
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    sp = P1Space(storage, 2)
    bc = BoundaryCondition.all_dirichlet()
    lap = P1ElementwiseOperator(sp, forms.laplace_form)
    mass = P1ElementwiseOperator(sp, forms.mass_form)
    U = lambda p: jnp.sin(jnp.pi * p[..., 0]) * jnp.sin(jnp.pi * p[..., 1]) * jnp.sin(
        jnp.pi * p[..., 2]
    )
    f = sp.interpolate(lambda p: 3 * jnp.pi**2 * U(p), sp.zeros(), DoFType.ALL, bc)
    b = sp.restore_rows(mass.apply_raw(f), sp.zeros(), FLAG_INNER, bc)
    solver = DirectCoarseSolver(lap, bc)
    x = solver(b)
    # direct solve: residual at solver precision
    r = b - lap.apply_inner(x, bc)
    rn = float(jnp.sqrt(sp.dot(r, r, FLAG_INNER, bc)))
    bn = float(jnp.sqrt(sp.dot(b, b, FLAG_INNER, bc)))
    assert rn < 1e-5 * bn, (rn, bn)


def test_vtk_output(tmp_path):
    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    sp = P1Space(storage, 2)
    u = sp.function().interpolate(lambda p: p[..., 0] + p[..., 1])
    out = VTKOutput(str(tmp_path), "solution", storage)
    out.add("u", sp, u.cells)
    path = out.write(level=2)
    text = open(path).read()
    assert "UnstructuredGrid" in text and 'Name="u"' in text
    # binary encoding: decode the types array, check 6 * 4^3 tets of type 10
    import base64
    import struct

    payload = text.split('Name="types" format="binary">\n')[1].split("\n")[0]
    raw = base64.b64decode(payload)
    (nbytes,) = struct.unpack("<I", raw[:4])
    types = np.frombuffer(raw[4:4 + nbytes], dtype=np.uint8)
    assert types.shape[0] == 6 * 4**3 and (types == 10).all()
    # ascii mode still supported
    path_a = out.write(level=2, ascii=True)
    assert "\n10\n" in open(path_a).read() or " 10\n" in open(path_a).read()
    p2 = write_domain_partitioning_vtk(storage, str(tmp_path), "dom")
    assert os.path.exists(p2)


def test_checkpoint_roundtrip_and_prolongate(tmp_path):
    from hyteg_tpu.operators.transfer import P1Transfer

    storage = CellStorage(mi.mesh_unit_cube(1), num_shards=1)
    sp2, sp3 = P1Space(storage, 2), P1Space(storage, 3)
    lin = lambda p: 1 + 2 * p[..., 0] - p[..., 2]
    u2 = sp2.function().interpolate(lin)
    exp = CheckpointExporter()
    exp.register("u", 2, u2.cells)
    exp.add_attribute("time", 3.25)
    path = exp.store(str(tmp_path), "ckpt", timestep=7)

    imp = CheckpointImporter(path)
    assert imp.attrs["time"] == 3.25
    assert imp.levels_of("u") == [2]
    restored = imp.restore("u", 2)
    assert np.allclose(restored, np.asarray(u2.cells))
    # restore into a finer level (restart-into-finer pattern)
    u3 = imp.restore_prolongated(
        "u", 2, 3, lambda l: P1Transfer(P1Space(storage, l), P1Space(storage, l + 1))
    )
    u3_expect = sp3.function().interpolate(lin)
    assert np.allclose(np.asarray(u3), np.asarray(u3_expect.cells), atol=1e-5)


def test_timing_tree():
    tt = TimingTree()
    with tt.scope("solve"):
        with tt.scope("smooth"):
            pass
        with tt.scope("smooth"):
            pass
    d = json.loads(tt.json())
    solve = d["children"][0]
    assert solve["name"] == "solve" and solve["count"] == 1
    assert solve["children"][0]["count"] == 2
    assert "smooth" in tt.pretty()


def test_config():
    cfg = from_dict(
        {"solver": {"max_level": 4, "smoother": "chebyshev"}, "nu": 1.5}
    )
    assert cfg.solver.max_level == 4
    assert cfg.nu == 1.5
    cfg2 = cfg.with_overrides({"solver.max_level": 6})
    assert cfg2.solver.max_level == 6
    assert cfg.solver.max_level == 4


def test_gmsh_export_roundtrip(tmp_path):
    """write_msh2 -> from_gmsh_file round-trips points and elements."""
    import numpy as np
    from hyteg_tpu.io.gmsh import write_msh2
    from hyteg_tpu.mesh import meshinfo as mi

    mesh = mi.mesh_unit_cube(1)
    path = str(tmp_path / "out.msh")
    write_msh2(mesh, path)
    back = mi.from_gmsh_file(path)
    assert back.dim == mesh.dim
    np.testing.assert_allclose(back.points, mesh.points, atol=1e-12)
    np.testing.assert_array_equal(back.elements, mesh.elements)


def test_manufactured_stokes_rhs_consistent():
    """Autodiff Stokes rhs matches a finite-difference check."""
    import numpy as np
    import jax.numpy as jnp
    from hyteg_tpu.numerictools.manufactured import (
        _stokes_pressure_2d, _stokes_vel_2d, stokes_stream_2d)

    pts = np.array([[0.3, 0.4], [0.7, 0.2]], dtype=np.float64)
    x = jnp.asarray(pts)
    fu, fv = stokes_stream_2d.f(x)
    h = 1e-3  # f32-friendly step

    def lap_fd(fn, comp, p):
        tot = 0.0
        for ax in range(2):
            e = np.zeros(2); e[ax] = h
            tot += (fn(jnp.asarray((p + e)[None]))[comp][0]
                    - 2 * fn(jnp.asarray(p[None]))[comp][0]
                    + fn(jnp.asarray((p - e)[None]))[comp][0]) / h**2
        return float(tot)

    def gradp_fd(p, ax):
        e = np.zeros(2); e[ax] = h
        return float((_stokes_pressure_2d(jnp.asarray((p + e)[None]))[0]
                      - _stokes_pressure_2d(jnp.asarray((p - e)[None]))[0])
                     / (2 * h))

    for i, p in enumerate(pts):
        want_u = -lap_fd(_stokes_vel_2d, 0, p) + gradp_fd(p, 0)
        want_v = -lap_fd(_stokes_vel_2d, 1, p) + gradp_fd(p, 1)
        assert abs(float(fu[i]) - want_u) < 5e-2 * max(1, abs(want_u))
        assert abs(float(fv[i]) - want_v) < 5e-2 * max(1, abs(want_v))
