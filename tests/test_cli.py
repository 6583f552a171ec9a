"""CLI end-to-end: every trainer mode and a couple of methods through
``sgformer_tpu.cli.main`` on synthetic datasets (SURVEY.md §2.6 parity)."""

import numpy as np
import pytest

from sgformer_tpu.cli.main import main


def test_cli_full_trainer(tmp_path):
    logger = main([
        "--dataset", "synth-n300-e2400-f16-c4", "--method", "sgformer",
        "--trainer", "full", "--epochs", "15", "--eval_step", "5",
        "--display_step", "-1", "--rand_split", "--hidden_channels", "32",
        "--save_result", "--result_dir", str(tmp_path),
    ])
    assert logger.run_summary(0)["final_test"] > 0.4
    assert list(tmp_path.glob("*.txt"))


def test_cli_batch_trainer():
    logger = main([
        "--dataset", "synth-n400-e3000-f16-c4", "--method", "sgformer",
        "--trainer", "batch", "--batch_size", "150", "--epochs", "10",
        "--eval_step", "5", "--display_step", "-1", "--rand_split",
        "--backbone", "graphconv",
    ])
    assert logger.results[0]


def test_cli_sampled_trainer():
    logger = main([
        "--dataset", "synth-n300-e2400-f16-c4", "--method", "sgformer",
        "--trainer", "sampled", "--batch_size", "64", "--epochs", "3",
        "--fanouts", "5", "3", "--display_step", "-1", "--rand_split",
        "--backbone", "graphconv",
    ])
    assert logger.results[0]


def test_cli_sharded_trainer():
    logger = main([
        "--dataset", "synth-n300-e2400-f16-c4", "--method", "sgformer",
        "--trainer", "sharded", "--epochs", "10", "--eval_step", "5",
        "--display_step", "-1", "--rand_split", "--backbone", "graphconv",
    ])
    assert logger.results[0]


@pytest.mark.parametrize("method", ["gcn", "mlp", "sgc", "appnp", "link"])
def test_cli_baseline_methods(method):
    logger = main([
        "--dataset", "synth-n200-e1500-f12-c3", "--method", method,
        "--trainer", "full", "--epochs", "5", "--eval_step", "5",
        "--display_step", "-1", "--rand_split",
    ])
    assert logger.results[0]


def test_cli_ablation_attention():
    logger = main([
        "--dataset", "synth-n200-e1500-f12-c3", "--method", "sgformer",
        "--attention", "softmax", "--trainer", "full", "--epochs", "5",
        "--eval_step", "5", "--display_step", "-1", "--rand_split",
    ])
    assert logger.results[0]


@pytest.mark.parametrize("method", ["difformer", "graphtrans", "h2gcn",
                                    "nodeformer", "graphormer"])
def test_cli_transformer_methods(method):
    logger = main([
        "--dataset", "synth-n150-e1000-f12-c3", "--method", method,
        "--trainer", "full", "--epochs", "3", "--eval_step", "2",
        "--display_step", "-1", "--rand_split", "--hidden_channels", "16",
        "--num_heads", "2",
    ])
    assert logger.results[0]


def test_cli_time_test():
    res = main([
        "--dataset", "synth-n200-e1500-f12-c3", "--method", "sgformer",
        "--trainer", "full", "--epochs", "3", "--display_step", "-1",
        "--rand_split", "--time_test",
    ])
    assert res.per_epoch_ms > 0 and res.forward_ms > 0


def test_cli_sharded_with_halo():
    logger = main([
        "--dataset", "synth-n240-e2000-f12-c4", "--method", "sgformer",
        "--trainer", "sharded", "--use_halo", "--epochs", "6",
        "--eval_step", "5", "--display_step", "-1", "--rand_split",
        "--backbone", "graphconv",
    ])
    assert logger.results[0]


def test_cli_save_attn(tmp_path):
    """--save_attn dumps [L, N, N] maps (the CLI plumbing the reference
    lacks for medium/ours.py:162-177)."""
    import numpy as np

    main([
        "--dataset", "synth-n80-e600-f8-c4", "--method", "sgformer",
        "--trainer", "full", "--hidden_channels", "16", "--epochs", "2",
        "--runs", "1", "--rand_split", "--display_step", "-1",
        "--trans_num_layers", "2",
        "--save_attn", "--attn_dir", str(tmp_path),
    ])
    files = list(tmp_path.iterdir())
    assert len(files) == 1
    attn = np.load(files[0])
    assert attn.shape == (2, 80, 80)
    assert np.isfinite(attn).all()


def test_cli_slab_mode(tmp_path):
    """--spmm_mode slab: clustering reorder + slab kernel end-to-end."""
    logger = main([
        "--dataset", "synth-n300-e2000-f8-c4", "--method", "sgformer",
        "--trainer", "full", "--hidden_channels", "16", "--epochs", "3",
        "--runs", "1", "--rand_split", "--display_step", "-1",
        "--use_pallas", "--spmm_mode", "slab", "--chunk_dtype", "f32",
    ])
    assert logger.results[0]


def test_cli_trans_residual_mode():
    """--trans_residual_mode reaches the model config: 'mean' pins the
    large-tier (x+prev)/2 residual (large/ours.py:211) independently of
    --alpha, while the 'alpha' default keeps medium/100M semantics."""
    import argparse

    from sgformer_tpu.cli.parse import parse_method, parser_add_main_args

    parser = parser_add_main_args(argparse.ArgumentParser())
    args = parser.parse_args([
        "--method", "sgformer", "--backbone", "graphconv",
        "--trans_residual_mode", "mean", "--alpha", "0.7",
    ])
    model = parse_method(args, n=100, c=4, d=16)
    assert model.config.trans_residual_mode == "mean"
    args = parser.parse_args(["--method", "sgformer"])
    assert parse_method(args, 100, 4, 16).config.trans_residual_mode == "alpha"
