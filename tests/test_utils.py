"""Tests for the data-ingestion layer (mirrors the reference's only test file,
tests/testthat/test_response_matrix.R, plus dataset/RData/diagnostic coverage).
"""

import numpy as np
import pytest

from gpirt_tpu.utils.response import (
    ResponseMatrix,
    response_matrix,
    is_response_matrix,
    as_response_matrix,
    encode_categories,
)


class TestResponseMatrix:
    def test_binary_01_matrix(self):
        x = np.array([[1, 1], [0, 0], [1, np.nan]])
        rm = response_matrix(x, {"yea": 1, "nay": 0, "missing": None}, verbose=False)
        want = np.array([[1, 1], [-1, -1], [1, np.nan]])
        np.testing.assert_array_equal(np.asarray(rm), want)

    def test_dataframe_dict_input(self):
        df = {"x1": [1, 0, 1], "x2": [1, 0, None]}
        rm = response_matrix(df, {"yea": 1, "nay": 0, "missing": None}, verbose=False)
        assert rm.shape == (3, 2)
        np.testing.assert_array_equal(
            np.asarray(rm), np.array([[1, 1], [-1, -1], [1, np.nan]])
        )

    def test_multiple_codes(self):
        x = np.array([[1, 3], [-1, -1], [2, np.nan]])
        rm = response_matrix(
            x, {"yea": [1, 2, 3], "nay": [-1], "missing": [None]}, verbose=False
        )
        np.testing.assert_array_equal(
            np.asarray(rm), np.array([[1, 1], [-1, -1], [1, np.nan]])
        )

    def test_unknown_codes_become_missing(self, capsys):
        x = np.array([[1, 9], [0, 0], [1, 1]])
        rm = response_matrix(x, {"yea": 1, "nay": 0, "missing": None}, verbose=True)
        err = capsys.readouterr().err
        assert "not given a response code" in err
        assert np.isnan(np.asarray(rm)[0, 1])
        assert rm.shape == (3, 2)

    def test_list_input_rejected(self):
        with pytest.raises(TypeError):
            response_matrix([{"a": 1}, {"a": 2}])

    def test_unanimous_items_dropped(self, capsys):
        x = np.array([[1, 1], [0, 1], [1, 1]])
        rm = response_matrix(x, {"yea": 1, "nay": 0, "missing": None}, verbose=True)
        assert rm.shape == (3, 1)
        assert "discarded as unanimous" in capsys.readouterr().err

    def test_is_response_matrix(self):
        good = ResponseMatrix(np.array([[1.0, -1.0], [np.nan, 1.0]]))
        assert is_response_matrix(good)
        assert not is_response_matrix(np.array([[1.0, -1.0]]))  # wrong class
        bad_values = ResponseMatrix(np.array([[2.0, -1.0]]))
        assert not is_response_matrix(bad_values)

    def test_as_response_matrix_idempotent(self):
        x = np.array([[1, 0], [0, 1], [1, np.nan]])
        rm = as_response_matrix(x, {"yea": 1, "nay": 0, "missing": None}, verbose=False)
        rm2 = as_response_matrix(rm)
        assert rm2 is rm


class TestEncodeCategories:
    def test_binary_pm1(self):
        x = np.array([[1.0, -1.0], [np.nan, 1.0]])
        y, C, uniq = encode_categories(x)
        assert C == 2
        np.testing.assert_array_equal(y[0], np.array([[2, 1], [0, 2]]))

    def test_ordinal_passthrough(self):
        x = np.array([[1.0, 5.0], [3.0, np.nan]])
        y, C, uniq = encode_categories(np.array([[1.0, 2.0], [3.0, np.nan]]))
        assert C == 3
        np.testing.assert_array_equal(y[0], np.array([[1, 2], [3, 0]]))

    def test_ordinal_noncontiguous_remapped(self, capsys):
        x = np.array([[2.0, 4.0], [6.0, np.nan]])
        y, C, uniq = encode_categories(x)
        assert C == 3
        np.testing.assert_array_equal(y[0], np.array([[1, 2], [3, 0]]))

    def test_3d_cube(self):
        x = np.stack([np.array([[1.0, -1.0]]), np.array([[-1.0, np.nan]])], axis=2)
        y, C, _ = encode_categories(x)
        assert y.shape == (2, 1, 2)
        np.testing.assert_array_equal(y[:, 0], np.array([[2, 1], [1, 0]]))


class TestDatasets:
    def test_sdo(self):
        from gpirt_tpu.utils.datasets import load_sdo

        sdo = load_sdo()
        assert sdo.shape[0] == 1500
        vals = sdo[~np.isnan(sdo)]
        assert set(np.unique(vals)) <= {1.0, 2.0, 3.0, 4.0, 5.0}

    def test_senate116_tidy(self):
        from gpirt_tpu.utils.datasets import load_senate116

        df = load_senate116()
        assert len(df["icpsr"]) == 42800  # documented row count (R/senate116.R:3)
        assert set(np.unique(df["cast_code"])) <= {0, 1, 2, 3, 4, 5, 6, 7, 8, 9}

    def test_senate116_matrix(self):
        from gpirt_tpu.utils.datasets import senate116_response_matrix

        rm, senators, rolls = senate116_response_matrix()
        assert rm.shape[0] == senators.size
        assert rm.shape[1] <= rolls.size  # unanimous items dropped
        assert is_response_matrix(rm)

    def test_csv_rebuild_matches_rda(self):
        """The raw-CSV path reproduces the vendored frame exactly."""
        import os

        from gpirt_tpu.utils import datasets as D

        if not os.path.exists(os.path.join(D._REFERENCE_RAW, "S116_votes.csv")):
            import pytest

            pytest.skip("reference raw CSVs not available")
        vendored = D.load_senate116()
        # force the CSV path by hiding both npz/rda candidates
        old_data, old_local = D._REFERENCE_DATA, D._LOCAL_DATA
        D._REFERENCE_DATA = D._LOCAL_DATA = "/nonexistent"
        try:
            csv = D.load_senate116()
        finally:
            D._REFERENCE_DATA, D._LOCAL_DATA = old_data, old_local
        for k in ("rollnumber", "icpsr", "cast_code"):
            np.testing.assert_array_equal(np.sort(vendored[k]), np.sort(csv[k]))

    def test_standalone_without_reference_mount(self):
        """Everything loads from the vendored in-repo data/ copies alone."""
        from gpirt_tpu.utils import datasets as D

        old_data, old_raw = D._REFERENCE_DATA, D._REFERENCE_RAW
        D._REFERENCE_DATA = D._REFERENCE_RAW = "/nonexistent"
        try:
            df = D.load_senate116()
            assert len(df["icpsr"]) == 42800
            rm, senators, rolls = D.senate116_response_matrix()
            assert rm.shape[0] == senators.size
            sdo, names = D.load_sdo(with_names=True)
            assert sdo.shape == (1500, 16) and names[0] == "q1"
        finally:
            D._REFERENCE_DATA, D._REFERENCE_RAW = old_data, old_raw


class TestRData:
    """Exercises the pure-Python RData reader against real .rda files.

    Uses the reference mount as a source of genuine R-serialized files;
    skipped when it isn't present (the framework itself no longer needs it —
    the bundled datasets are vendored as data/*.npz)."""

    def test_sdo_roundtrip_types(self):
        import os

        import pytest

        from gpirt_tpu.utils.rdata import load_rda

        if not os.path.exists("/root/reference/data/SDO.rda"):
            pytest.skip("reference .rda not available")
        objs = load_rda("/root/reference/data/SDO.rda")
        assert "SDO" in objs
        df = objs["SDO"].to_python()
        assert isinstance(df, dict) and len(df) == 16

    def test_senate_rda(self):
        import os

        import pytest

        from gpirt_tpu.utils.rdata import load_rda

        if not os.path.exists("/root/reference/data/senate116.rda"):
            pytest.skip("reference .rda not available")
        objs = load_rda("/root/reference/data/senate116.rda")
        df = objs["senate116"].to_python()
        assert len(np.asarray(df["cast_code"])) == 42800


class TestIRF:
    def test_probabilities_sum_to_one(self):
        from gpirt_tpu.utils.irf import irf_probabilities

        rng = np.random.default_rng(0)
        N, m, C = 21, 3, 4
        fstar = rng.standard_normal((N, m))
        cuts = np.sort(rng.standard_normal((m, C - 1)), axis=1)
        thr = np.concatenate(
            [np.full((m, 1), -np.inf), cuts, np.full((m, 1), np.inf)], axis=1
        )
        p = irf_probabilities(fstar, thr)
        assert p.shape == (N, m, C)
        assert np.all(p >= 0)
        np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-12)

    def test_binary_closed_form(self):
        from gpirt_tpu.utils.irf import irf_probabilities
        from scipy import stats

        fstar = np.array([[0.7]])
        thr = np.array([[-np.inf, 0.2, np.inf]])
        p = irf_probabilities(fstar, thr)
        np.testing.assert_allclose(p[0, 0, 1], 1 - stats.norm.cdf(0.2 - 0.7))

    def test_posterior_irf_from_chain(self):
        from gpirt_tpu.api import gpirt_mcmc
        from gpirt_tpu.utils.datasets import simulate_2pl
        from gpirt_tpu.utils.irf import posterior_irf

        _, y = simulate_2pl(8, n=12, m=5)
        out = gpirt_mcmc(
            y, 4, 1, vote_codes={"yea": 1, "nay": 0, "missing": None},
            store_fstar=True, dtype="float64", grid_size=101, verbose=False,
        )
        irf = posterior_irf(out[0])
        m_kept = out[0]["beta"].shape[2]
        assert irf.shape == (101, m_kept, 2)
        np.testing.assert_allclose(irf.sum(-1), 1.0, rtol=1e-10)
        assert np.all((irf >= 0) & (irf <= 1))
