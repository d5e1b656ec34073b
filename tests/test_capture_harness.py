"""Exercise the reference-capture harness against a MOCKED reference tree.

The real `/root/reference` mount has been empty every round; this test
keeps tools/capture_reference_goldens.py a *working* code path by
generating a minimal fake ``pyGPs`` package (numpy f64, reusing the
shared-nothing oracle algorithms from tests/oracles.py for EP/Laplace),
capturing goldens from it, and running the SAME verbatim comparison that
tests/test_goldens.py applies when a real capture exists.  Passing means:
the harness drives the reference API correctly end-to-end AND our
implementation matches a faithful reference to the documented tolerances.
"""

import subprocess
import sys
from pathlib import Path

import pytest

TESTS_DIR = Path(__file__).resolve().parent

# The mock implements exactly the API surface the harness drives
# (SURVEY.md §2.3-2.4: setPrior/setData/setNoise/getPosterior/predict,
# cov.RBF/Linear with log-hyps and `+` composition, mean.Zero).
MOCK_PYGPS = '''
"""Minimal mock of upstream pyGPs for harness testing (numpy f64)."""
import sys
import numpy as np

sys.path.insert(0, {tests_dir!r})
import oracles

__version__ = "mock-1.3.5"


class _RBF:
    def __init__(self, log_ell=0.0, log_sigma=0.0):
        self.log_ell, self.log_sigma = log_ell, log_sigma

    def __add__(self, other):
        return _SumKernel(self, other)

    def K(self, a, b):
        ell2 = np.exp(2.0 * self.log_ell)
        sf2 = np.exp(2.0 * self.log_sigma)
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        return sf2 * np.exp(-0.5 * d2 / ell2)


class _Linear:
    def __init__(self, log_sigma=0.0):
        self.log_sigma = log_sigma

    def __add__(self, other):
        return _SumKernel(self, other)

    def K(self, a, b):
        return np.exp(2.0 * self.log_sigma) * (a @ b.T)


class _SumKernel:
    def __init__(self, k1, k2):
        self.k1, self.k2 = k1, k2

    def K(self, a, b):
        return self.k1.K(a, b) + self.k2.K(a, b)


class _Zero:
    def m(self, x):
        return np.zeros(len(x))


class cov:
    RBF = _RBF
    Linear = _Linear


class mean:
    Zero = _Zero


def _phi(z):
    from math import erf
    return 0.5 * (1.0 + np.vectorize(erf)(z / np.sqrt(2.0)))


class GPR:
    def __init__(self):
        self.log_sn = np.log(0.1)

    def setPrior(self, mean=None, kernel=None):
        self.kern, self.meanf = kernel, mean

    def setData(self, x, y):
        self.x, self.y = np.asarray(x, float), np.asarray(y, float).ravel()

    def setNoise(self, log_sigma):
        self.log_sn = log_sigma

    def getPosterior(self):
        x, y = self.x, self.y
        n = len(y)
        sn2 = np.exp(2.0 * self.log_sn)
        K = self.kern.K(x, x)
        Kt = K + sn2 * np.eye(n)
        L = np.linalg.cholesky(Kt)
        self.alpha = np.linalg.solve(Kt, y)
        self.L, self.sn2 = L, sn2
        self.nlZ = (0.5 * y @ self.alpha + np.log(np.diag(L)).sum()
                    + 0.5 * n * np.log(2 * np.pi))
        return self.nlZ

    def predict(self, xs):
        Ks = self.kern.K(self.x, np.asarray(xs, float))
        kss = np.diag(self.kern.K(np.asarray(xs, float),
                                  np.asarray(xs, float)))
        fm = Ks.T @ self.alpha
        V = np.linalg.solve(self.L, Ks)
        fs2 = np.maximum(kss - (V * V).sum(0), 0.0)
        ym, ys2 = fm, fs2 + self.sn2
        return ym, ys2, fm, fs2, None


class GPC:
    def __init__(self):
        self.inf = "EP"

    def useInference(self, name):
        self.inf = name

    def setPrior(self, mean=None, kernel=None):
        self.kern, self.meanf = kernel, mean

    def setData(self, x, y):
        self.x, self.y = np.asarray(x, float), np.asarray(y, float).ravel()

    def getPosterior(self):
        x, y = self.x, self.y
        K = self.kern.K(x, x)
        m = np.zeros(len(y))
        if self.inf == "EP":
            ttau, tnu, nlZ, mu, Sigma, _ = oracles.sequential_ep(K, m, y)
            self.post_mu = mu
            self.W = ttau
            self.nu_site = tnu
        else:
            f, nlZ, _ = oracles.brentmin_laplace(K, m, y)
            _, _, d2lp, _ = oracles.erf_laplace_derivs(y, f)
            self.post_mu = f
            self.W = -d2lp
            self.nu_site = None
        self.K, self.nlZ = K, float(nlZ)
        return self.nlZ

    def predict(self, xs, ys=None):
        xs = np.asarray(xs, float)
        Ks = self.kern.K(self.x, xs)
        kss = np.diag(self.kern.K(xs, xs))
        sW = np.sqrt(np.maximum(self.W, 0.0))
        n = len(self.post_mu)
        B = np.eye(n) + sW[:, None] * self.K * sW[None, :]
        Lb = np.linalg.cholesky(B)
        if self.nu_site is not None:      # EP: alpha from site naturals
            alpha = self.nu_site - sW * np.linalg.solve(
                B, sW * (self.K @ self.nu_site))
        else:                             # Laplace: alpha = K^-1 (f - m)
            alpha = np.linalg.solve(self.K, self.post_mu)
        fm = Ks.T @ alpha
        V = np.linalg.solve(Lb, sW[:, None] * Ks)
        fs2 = np.maximum(kss - (V * V).sum(0), 1e-12)
        p = _phi(fm / np.sqrt(1.0 + fs2))
        ysr = np.asarray(ys, float).ravel() if ys is not None else np.ones(len(xs))
        py = np.where(ysr > 0, p, 1.0 - p)
        lp = np.log(np.maximum(py, 1e-300))
        ym = 2.0 * p - 1.0
        ys2v = 1.0 - (2.0 * p - 1.0) ** 2
        return ym, ys2v, fm, fs2, lp


class GPR_FITC:
    def __init__(self):
        self.log_sn = np.log(0.1)

    def setPrior(self, mean=None, kernel=None, inducing_points=None):
        self.kern, self.meanf = kernel, mean
        self.u = np.asarray(inducing_points, float)

    def setData(self, x, y):
        self.x, self.y = np.asarray(x, float), np.asarray(y, float).ravel()

    def setNoise(self, log_sigma):
        self.log_sn = log_sigma

    def getPosterior(self):
        x, y, u = self.x, self.y, self.u
        n, mi = len(y), len(u)
        sn2 = np.exp(2.0 * self.log_sn)
        snu2 = 1e-6 * sn2                     # reference Kuu jitter rule
        Kuu = self.kern.K(u, u) + snu2 * np.eye(mi)
        Kuf = self.kern.K(u, x)
        dKff = np.diag(self.kern.K(x, x))
        Luu = np.linalg.cholesky(Kuu)
        V = np.linalg.solve(Luu, Kuf)         # (m, n)
        g = dKff - (V * V).sum(0) + sn2       # FITC diagonal
        Vg = V / g[None, :]
        A = np.eye(mi) + Vg @ V.T
        La = np.linalg.cholesky(A)
        be = Vg @ y
        z = np.linalg.solve(A, be)
        # nlZ via matrix determinant lemma + Woodbury
        quad = (y / g) @ y - be @ z
        logdet = np.log(g).sum() + 2.0 * np.log(np.diag(La)).sum()
        self.nlZ = 0.5 * (quad + logdet + n * np.log(2 * np.pi))
        # posterior over inducing values for prediction
        self.Luu, self.V, self.g, self.z = Luu, V, g, z
        self.sn2 = sn2
        return self.nlZ

    def predict(self, xs):
        xs = np.asarray(xs, float)
        Ksu = self.kern.K(xs, self.u)         # (ns, m)
        kss = np.diag(self.kern.K(xs, xs))
        # FITC predictive: fm = Ksu Kuu^-1 (mu_u); standard Qff form
        W = np.linalg.solve(self.Luu, Ksu.T)  # (m, ns)
        fm = W.T @ self.z
        Vg = self.V / self.g[None, :]
        A = np.eye(len(self.u)) + Vg @ self.V.T
        La = np.linalg.cholesky(A)
        T = np.linalg.solve(La, W)
        qss = (W * W).sum(0)
        fs2 = np.maximum(kss - qss + (T * T).sum(0), 0.0)
        return fm, fs2 + self.sn2, fm, fs2, None
'''


@pytest.fixture(scope="module")
def mock_reference(tmp_path_factory):
    root = tmp_path_factory.mktemp("mock_ref")
    pkg = root / "pyGPs"
    pkg.mkdir()
    (pkg / "__init__.py").write_text(
        MOCK_PYGPS.format(tests_dir=str(TESTS_DIR)))
    return root


def test_capture_from_mock_reference(mock_reference, tmp_path):
    """End-to-end: harness imports the mock, captures all four configs,
    and OUR implementation matches the captured goldens verbatim."""
    # run capture in a subprocess — the harness mutates sys.path/imports
    out = tmp_path / "goldens_reference.json"
    r = subprocess.run(
        [sys.executable, str(TESTS_DIR.parent / "tools"
                             / "capture_reference_goldens.py"),
         "--reference", str(mock_reference), "--out", str(out)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert out.exists()

    import json

    gold = json.loads(out.read_text())
    for name in ("config0_exact_gpr", "config1_ep_gpc",
                 "config2_laplace_gpc_composite", "config3_fitc_gpr"):
        assert name in gold and "error" not in gold[name], gold.get(name)
    assert gold["_meta"]["reference_version"] == "mock-1.3.5"

    from pygps_tpu.utils import refcapture

    fails = refcapture.compare_against_ours(gold)
    assert not fails, fails


def test_import_reference_nested_layout(mock_reference, tmp_path):
    """The package can sit anywhere under the mount (installed-style
    layout): import_reference must add the directory CONTAINING pyGPs,
    not the package dir itself, to sys.path."""
    import shutil
    import subprocess

    nested = tmp_path / "mount" / "src" / "site-packages"
    nested.mkdir(parents=True)
    shutil.copytree(mock_reference / "pyGPs", nested / "pyGPs")
    # run in a subprocess (import_reference mutates sys.path/modules)
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from pygps_tpu.utils import refcapture\n"
        "m = refcapture.import_reference({mount!r})\n"
        "assert m.__version__ == 'mock-1.3.5', m.__version__\n"
        "assert m.__file__ is not None\n"
        "print('NESTED-IMPORT-OK')\n"
    ).format(repo=str(TESTS_DIR.parent), mount=str(tmp_path / "mount"))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120)
    assert "NESTED-IMPORT-OK" in r.stdout, r.stdout + r.stderr
