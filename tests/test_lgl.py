"""LGL coefficient derivation checks: interpolation/defect exactness on
polynomials (the defining property of the schemes) and agreement with the
reference's hard-coded tables (`src/OptimalControl/LGLCoeffs.h`)."""

import numpy as np
import pytest

from asset_asrl_tpu.OptimalControl.lgl import (LGLScheme,
                                               lobatto_points_weights)


@pytest.mark.parametrize("cs", [2, 3, 4])
def test_defect_exact_on_polynomials(cs):
    """The scheme must zero the defect for any polynomial trajectory of
    degree <= 2*cs-1 with matching derivative."""
    s = LGLScheme(cs)
    rng = np.random.default_rng(cs)
    deg = 2 * cs - 1
    coeffs = rng.normal(size=deg + 1)
    p = np.polynomial.Polynomial(coeffs)
    dp = p.deriv()
    h = 1.0  # local coords
    x = p(s.cardinal_tau)
    hf = dp(s.cardinal_tau)
    for i, ti in enumerate(s.interior_tau):
        x_int = s.x_interp[i] @ x + s.dx_interp[i] @ hf
        assert abs(x_int - p(ti)) < 1e-11
        defect = s.x_def[i] @ x + s.dx_def[i] @ hf + s.int_def[i] * dp(ti)
        assert abs(defect) < 1e-11


@pytest.mark.parametrize("cs", [2, 3, 4])
def test_quadrature(cs):
    """Full Lobatto rule is exact to degree 2*(2cs-1)-3; reduced rule to
    degree cs-1."""
    s = LGLScheme(cs)
    npts = 2 * cs - 1
    for deg in range(2 * npts - 3 + 1):
        exact = 1.0 / (deg + 1)
        full = (s.quad_cardinal @ s.cardinal_tau ** deg
                + s.quad_interior @ s.interior_tau ** deg)
        assert abs(full - exact) < 1e-12, f"deg {deg}"
    for deg in range(cs):
        exact = 1.0 / (deg + 1)
        red = s.quad_reduced @ s.cardinal_tau ** deg
        assert abs(red - exact) < 1e-12


def test_matches_reference_lgl3():
    """Spot-check the derived tables against the reference's published LGL3
    values (`LGLCoeffs.h:20-56`)."""
    s = LGLScheme(2)
    assert np.allclose(s.cardinal_tau, [0, 1])
    assert np.allclose(s.interior_tau, [0.5])
    assert np.allclose(s.x_interp, [[0.5, 0.5]])
    assert np.allclose(s.dx_interp, [[0.125, -0.125]])
    assert np.allclose(s.x_def, [[1.0, -1.0]])
    assert np.allclose(s.dx_def, [[1 / 6, 1 / 6]])
    assert np.allclose(s.int_def, [4 / 6])


def test_matches_reference_lgl5():
    """Reference `LGLCoeffs.h:62-162` values for CS=3."""
    s = LGLScheme(3)
    SQRT21 = np.sqrt(21.0)
    assert np.allclose(s.interior_tau,
                       [0.172673164646011, 0.827326835353989])
    a = 1 / 686
    assert np.allclose(
        s.x_interp[0],
        [(39 * SQRT21 + 231) * a, 224 * a, (-39 * SQRT21 + 231) * a])
    c = 1 / 360
    assert np.allclose(
        s.x_def[0],
        [(32 * SQRT21 + 180) * c, -64 * SQRT21 * c, (32 * SQRT21 - 180) * c])
    assert np.allclose(s.int_def, [98 * c, 98 * c])
    assert np.allclose(s.quad_reduced, [1 / 6, 2 / 3, 1 / 6])


def test_lobatto_weights():
    x, w = lobatto_points_weights(5)
    assert np.allclose(x, [0, (1 - np.sqrt(21) / 7) / 2, 0.5,
                           (1 + np.sqrt(21) / 7) / 2, 1])
    assert abs(sum(w) - 1.0) < 1e-14
