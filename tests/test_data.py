"""Data layer: synthetic generator properties, KIN40K formats + replicate protocol."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpscore.data import kin40k_replicate_split, load_kin40k, sample_synthetic_1d
from gpscore.data.kin40k import synthesize_kin40k_like


def test_synthetic_shapes_and_truth_scale():
    d = sample_synthetic_1d(jax.random.PRNGKey(0))
    assert d.train_x.shape == (120, 1) and d.train_y.shape == (120,)
    assert d.test_x.shape == (300, 1) and d.va_x.shape == (30, 1)
    # y marginal variance = k^2 + noise^2 = 1.09 -> sample std in a sane band
    std = float(jnp.std(d.train_y))
    assert 0.6 < std < 1.6, std


def test_synthetic_deterministic_per_key():
    a = sample_synthetic_1d(jax.random.PRNGKey(7), num_train=16, num_test=4, num_va=4)
    b = sample_synthetic_1d(jax.random.PRNGKey(7), num_train=16, num_test=4, num_va=4)
    np.testing.assert_array_equal(np.asarray(a.train_y), np.asarray(b.train_y))
    c = sample_synthetic_1d(jax.random.PRNGKey(8), num_train=16, num_test=4, num_va=4)
    assert not np.allclose(np.asarray(a.train_y), np.asarray(c.train_y))


def test_kin40k_synthetic_standin_shapes():
    d = synthesize_kin40k_like(n_pool=100, n_test=50)
    assert d.train_x.shape == (100, 8) and d.test_x.shape == (50, 8)
    # standardized target
    y = np.concatenate([d.train_y, d.test_y])
    assert abs(y.mean()) < 0.05 and abs(y.std() - 1.0) < 0.05


def test_kin40k_npz_roundtrip(tmp_path):
    d = synthesize_kin40k_like(n_pool=64, n_test=32)
    path = str(tmp_path / "kin40k.npz")
    np.savez(path, trainx=d.train_x, trainy=d.train_y, testx=d.test_x, testy=d.test_y)
    back = load_kin40k(path)
    np.testing.assert_array_equal(back.train_x, d.train_x)
    np.testing.assert_array_equal(back.test_y, d.test_y)


def test_kin40k_csv_dir(tmp_path):
    d = synthesize_kin40k_like(n_pool=16, n_test=8)
    for name, arr in [("trainx", d.train_x), ("trainy", d.train_y),
                      ("testx", d.test_x), ("testy", d.test_y)]:
        np.savetxt(str(tmp_path / f"{name}.csv"), arr, delimiter=",")
    back = load_kin40k(str(tmp_path))
    np.testing.assert_allclose(back.train_x, d.train_x, rtol=1e-5)


def test_replicate_split_protocol():
    """n_subsample + n_va drawn w/o replacement; va carved out; first n_test test
    rows (`kin40k-FULL-compare.py:194-214`)."""
    d = synthesize_kin40k_like(n_pool=2000, n_test=600)
    s = kin40k_replicate_split(d, replicate=3, n_subsample=100, n_va=50, n_test=200)
    assert s.train_x.shape == (100, 8)
    assert s.va_x.shape == (50, 8)
    assert s.test_x.shape == (200, 8)
    np.testing.assert_array_equal(np.asarray(s.test_x), d.test_x[:200])
    # train and validation rows are disjoint
    train_rows = {tuple(r) for r in np.asarray(s.train_x).round(6).tolist()}
    va_rows = {tuple(r) for r in np.asarray(s.va_x).round(6).tolist()}
    assert not train_rows & va_rows


def test_replicate_split_seeded_by_replicate():
    d = synthesize_kin40k_like(n_pool=500, n_test=100)
    a = kin40k_replicate_split(d, 1, n_subsample=50, n_va=20, n_test=50)
    b = kin40k_replicate_split(d, 1, n_subsample=50, n_va=20, n_test=50)
    c = kin40k_replicate_split(d, 2, n_subsample=50, n_va=20, n_test=50)
    np.testing.assert_array_equal(np.asarray(a.train_x), np.asarray(b.train_x))
    assert not np.array_equal(np.asarray(a.train_x), np.asarray(c.train_x))


def test_load_kin40k_bad_path_suffix(tmp_path):
    p = tmp_path / "data.txt"
    p.write_text("nope")
    with pytest.raises(ValueError):
        load_kin40k(str(p))


def test_xlsx_lite_roundtrip(tmp_path):
    """write_sheets -> read_sheets is exact for fp32-representable values,
    including 1-D sheets, multi-sheet workbooks, and NaN -> empty cells."""
    from gpscore.data.xlsx_lite import read_sheets, write_sheets

    rng = np.random.default_rng(0)
    a = rng.standard_normal((7, 3)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    c = a.copy()
    c[2, 1] = np.nan
    p = str(tmp_path / "wb.xlsx")
    write_sheets(p, {"alpha": a, "beta": b, "gamma": c})
    back = read_sheets(p)
    np.testing.assert_array_equal(back["alpha"], a)
    np.testing.assert_array_equal(back["beta"], b.reshape(1, -1))
    np.testing.assert_array_equal(back["gamma"], c)
    # subset + missing-sheet error
    assert set(read_sheets(p, ["beta"])) == {"beta"}
    with pytest.raises(KeyError, match="missing sheets"):
        read_sheets(p, ["nope"])


def test_xlsx_lite_wide_columns(tmp_path):
    """Column refs beyond 'Z' (AA...) round-trip (the bijective base-26)."""
    from gpscore.data.xlsx_lite import read_sheets, write_sheets

    arr = np.arange(2 * 30, dtype=np.float32).reshape(2, 30)
    p = str(tmp_path / "wide.xlsx")
    write_sheets(p, {"w": arr})
    np.testing.assert_array_equal(read_sheets(p)["w"], arr)


def test_load_kin40k_xlsx(tmp_path):
    """The reference's on-disk format (`kin40k-FULL-compare.py:197-200`):
    sheets trainx/trainy/testx/testy through load_kin40k end-to-end, then the
    replicate-split protocol on top. Hermetic (gpscore.data.xlsx_lite) — no
    openpyxl needed."""
    from gpscore.data.xlsx_lite import write_sheets

    d = synthesize_kin40k_like(n_pool=40, n_test=20)
    p = str(tmp_path / "kin40k.xlsx")
    write_sheets(
        p,
        {
            "trainx": d.train_x,
            "trainy": d.train_y.reshape(-1, 1),
            "testx": d.test_x,
            "testy": d.test_y.reshape(-1, 1),
        },
    )
    back = load_kin40k(p)
    np.testing.assert_array_equal(back.train_x, d.train_x)
    np.testing.assert_array_equal(back.train_y, d.train_y)
    np.testing.assert_array_equal(back.test_x, d.test_x)
    np.testing.assert_array_equal(back.test_y, d.test_y)
    s = kin40k_replicate_split(back, 0, n_subsample=10, n_va=5, n_test=10)
    assert s.train_x.shape == (10, 8)


def test_xlsx_lite_rejects_non_numeric(tmp_path):
    """A workbook with text cells fails loudly, pointing at npz/csv."""
    import zipfile

    from gpscore.data.xlsx_lite import read_sheets, write_sheets

    p = str(tmp_path / "bad.xlsx")
    write_sheets(p, {"s": np.ones((2, 2), np.float32)})
    # graft a string cell into the sheet XML (inline str type)
    with zipfile.ZipFile(p) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    parts["xl/worksheets/sheet1.xml"] = parts["xl/worksheets/sheet1.xml"].replace(
        b'<c r="A1"><v>1.0</v></c>', b'<c r="A1" t="str"><v>header</v></c>'
    )
    with zipfile.ZipFile(p, "w") as zf:
        for n, raw in parts.items():
            zf.writestr(n, raw)
    with pytest.raises(ValueError, match="non-numeric"):
        read_sheets(p)
