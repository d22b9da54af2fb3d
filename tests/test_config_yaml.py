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


def test_yaml_abbreviated_config_flag(tmp_path):
    """argparse accepts unambiguous abbreviations (--conf); the YAML
    pre-scan must honor the same spellings or the file's defaults are
    silently dropped."""
    cfg = _write(tmp_path, "save_dir: /tmp/o\ndata_path: d.bed\nname: run\n"
                           "batch_size: 77\n")
    args = parse_train_args(["--conf", cfg])
    assert args.batch_size == 77


def test_yaml_stream_int_and_bool(tmp_path):
    """YAML bypasses argparse's choices check: `stream: 0` (int) must mean
    forced-resident, not fall back to auto, and booleans must not crash."""
    from neural_admixture_tpu.train.run import main_train  # noqa: F401

    cfg = _write(tmp_path, "save_dir: /tmp/o\ndata_path: d.bed\nname: run\n"
                           "stream: 0\n")
    args = parse_train_args(["--config", cfg])
    assert args.stream == 0
    # the run.py normalization maps it to forced-resident
    stream_map = {"auto": None, None: None, "0": False, 0: False,
                  False: False, "1": True, 1: True, True: True}
    assert stream_map[args.stream] is False


def test_infer_parser_yaml(tmp_path):
    cfg = _write(tmp_path, "out_name: x\nsave_dir: /tmp/o\ndata_path: d.bed\n"
                           "name: run\n")
    args = parse_infer_args(["--config", cfg])
    assert args.out_name == "x"
