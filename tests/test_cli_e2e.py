"""End-to-end smoke tests through the CLI driver (SURVEY.md §4 plan #4)."""

import numpy as np
import pytest

from ffvd_tpu import cli

# heavy compile/e2e module: excluded from the `-m quick` tier
pytestmark = pytest.mark.slow


def run_cli(args):
    return cli.main(args + ["--platform", "cpu"])


def test_cli_c4_ballbeam_short():
    out = run_cli(["--file_index", "5", "--case_val", "4",
                   "--iterations", "100", "--chunk_size", "100"])
    assert np.isfinite(out["rmse"]) and np.isfinite(out["nll"])
    # 200 steps from the warm start reliably reaches a good fit; the full
    # reference run landed at RMSE 0.028 (tests/golden/tf_reference_e2e.json)
    assert out["rmse"] < 0.05
    assert out["final_elbo"] > 3.0      # nll dropped below -3


def test_cli_linear_kernel():
    out = run_cli(["--file_index", "2", "--case_val", "4",
                   "--iterations", "20", "--chunk_size", "20",
                   "--kernel_type", "LinearK", "--samples", "2"])
    assert np.isfinite(out["rmse"])


@pytest.mark.parametrize("x_dims", [2, 6])
def test_cli_x_dims(x_dims):
    out = run_cli(["--file_index", "1", "--case_val", "4",
                   "--iterations", "10", "--chunk_size", "10",
                   "--x_dims", str(x_dims), "--samples", "2"])
    assert np.isfinite(out["rmse"])


def test_cli_c2_sghmc_eval_thinning():
    out = run_cli(["--file_index", "5", "--case_val", "2",
                   "--iterations", "3", "--chunk_size", "3",
                   "--samples", "2", "--posterior_sample_spacing", "4"])
    assert np.isfinite(out["rmse"])


def test_cli_ensemble(tmp_path):
    out = run_cli(["--file_index", "5", "--case_val", "4",
                   "--iterations", "30", "--chunk_size", "30",
                   "--samples", "2", "--n_ensemble", "2",
                   "--results_dir", str(tmp_path)])
    assert np.isfinite(out["rmse"]) and np.isfinite(out["nll"])
    assert len(out["per_chain"]) == 2
    # the ensemble path writes the same results-npz contract as the
    # single-chain path: pooled mixture predictions, chain 0's params
    files = list((tmp_path / "ballbeam").glob("*_results.npz"))
    assert len(files) == 1
    with np.load(files[0]) as z:
        n_test = z["Y_test_data"].shape[0]
        assert z["y_test_vfe"].shape == (n_test,)
        assert z["v_test_vfe_var"].shape == (n_test,)
        assert z["y_train_vfe"].size > 0          # fit_y computed on demand
        assert np.all(z["v_test_vfe_var"] > 0)


def test_cli_log_clip_parsing():
    """--sghmc_log_clip[_lower] spellings → FFVDConfig kwargs."""
    from ffvd_tpu.cli import _log_clip_kwargs
    assert _log_clip_kwargs(None, None) == {}
    assert _log_clip_kwargs("none", None) == {"sghmc_log_clip": None}
    assert _log_clip_kwargs("0", None) == {"sghmc_log_clip": None}
    assert _log_clip_kwargs("10", None) == {"sghmc_log_clip": 10.0}
    assert _log_clip_kwargs(None, "-25") == {"sghmc_log_clip_lower": -25.0}
    # 'none' lower mirrors -upper (config property handles the mirroring)
    assert _log_clip_kwargs("10", "none") == {
        "sghmc_log_clip": 10.0, "sghmc_log_clip_lower": None}


def test_cli_pg_ancestor_trace_flag_forms():
    """The round-5 flag forms: absent -> None (config resolves to True);
    bare -> True; explicit booleans parse; the compat pairing stays
    constructible through the CLI (noop + absent trace)."""
    from ffvd_tpu.cli import build_argparser
    from ffvd_tpu.config import FFVDConfig

    p = build_argparser()
    assert p.parse_args([]).pg_ancestor_trace is None
    assert p.parse_args(["--pg_ancestor_trace"]).pg_ancestor_trace is True
    assert p.parse_args(
        ["--pg_ancestor_trace", "false"]).pg_ancestor_trace is False
    assert p.parse_args(
        ["--pg_ancestor_trace", "true"]).pg_ancestor_trace is True
    # absent flag + compat noop resolves without the mutual-exclusion error
    cfg = FFVDConfig(case=6, pg_compat_noop=True,
                     pg_ancestor_trace=p.parse_args(
                         ["--pg_compat_noop"]).pg_ancestor_trace)
    assert cfg.pg_ancestor_trace is False
