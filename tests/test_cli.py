"""CLI integration (reference `tests/test_cli.py` strategy: every
sub-command driven through the entry point, in-process)."""

import pytest

from orthority_ray.cli import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "pip_join" in out and "oracle-checked" in out


def test_cli_tiles(capsys, sf_unit):
    assert main(["tiles", "--sf-dir", sf_unit]) == 0
    out = capsys.readouterr().out
    assert "tile_id" in out


def test_cli_query(capsys, sf_unit):
    assert main(["query", "cell_counts", "--sf-dir", sf_unit, "--limit", "5"]) == 0
    out = capsys.readouterr().out
    assert "n_docs" in out


def test_cli_query_unknown(capsys):
    assert main(["query", "nope"]) == 2


def test_cli_refine(capsys):
    assert main(["refine", "--method", "shift"]) == 0
    assert "dj_px" in capsys.readouterr().out


def test_cli_flagship(tmp_path, capsys, sf_unit):
    assert main(["flagship", "--sf-dir", sf_unit, "--out", str(tmp_path / "o"), "--parts", "4"]) == 0
    out = capsys.readouterr().out
    assert "checksum" in out

def test_cli_query_stats_names_join_plan(capsys, sf_unit):
    """--stats surfaces the adaptive-join decision (r3 verdict #8): the
    strategy line names broadcast vs salted/bucketed-shuffle and the
    hot-key count, so a misplan at scale is observable."""
    assert main(["query", "host_page_join", "--sf-dir", sf_unit,
                 "--limit", "3", "--stats"]) == 0
    out = capsys.readouterr().out
    assert "join plan: key=host" in out
    assert "strategy=" in out and "hot_keys=" in out
    assert "n_buckets=" in out
