"""--config YAML behavior (configargparse parity)."""
import pytest

from neural_admixture_tpu.entry import parse_infer_args, parse_train_args


def _write(tmp_path, text):
    p = tmp_path / "cfg.yaml"
    p.write_text(text)
    return str(p)


def test_yaml_satisfies_required_args(tmp_path):
    cfg = _write(tmp_path, "save_dir: /tmp/o\ndata_path: d.bed\nname: run\n"
                           "k: 3\nepochs: 7\n")
    args = parse_train_args(["--config", cfg])
    assert args.save_dir == "/tmp/o"
    assert args.epochs == 7
    assert args.k == 3


def test_yaml_equals_form_is_loaded(tmp_path):
    cfg = _write(tmp_path, "save_dir: /tmp/o\ndata_path: d.bed\nname: run\n"
                           "batch_size: 99\n")
    args = parse_train_args([f"--config={cfg}"])
    assert args.batch_size == 99


def test_cli_flags_override_yaml(tmp_path):
    cfg = _write(tmp_path, "save_dir: /tmp/o\ndata_path: d.bed\nname: run\n"
                           "epochs: 7\n")
    args = parse_train_args(["--config", cfg, "--epochs", "11"])
    assert args.epochs == 11


def test_missing_required_still_errors(tmp_path):
    cfg = _write(tmp_path, "epochs: 7\n")  # no save_dir/data_path/name
    with pytest.raises(SystemExit):
        parse_train_args(["--config", cfg])


def test_infer_parser_yaml(tmp_path):
    cfg = _write(tmp_path, "out_name: x\nsave_dir: /tmp/o\ndata_path: d.bed\n"
                           "name: run\n")
    args = parse_infer_args(["--config", cfg])
    assert args.out_name == "x"
