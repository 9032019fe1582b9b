"""Drop-in CLI (python -m xrenner_spark) — reference xrenner.py surface."""

import glob
import io
import os
import shutil

import pytest

from xrenner_spark import load_lex
from xrenner_spark.cli import main
from xrenner_spark.kernel import analyze_document
from xrenner_spark.output import output_sgml

HERE = os.path.dirname(os.path.abspath(__file__))
DOCS = os.path.join(HERE, "fixtures", "docs")


def first_doc():
    return sorted(glob.glob(os.path.join(DOCS, "*.conllu")))[0]


def test_single_file_sgml_to_stdout(tmp_path, capsysbinary, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["-o", "sgml", first_doc()]) == 0
    got = capsysbinary.readouterr().out.decode("utf8")
    doc = first_doc()
    lex = load_lex()
    expect = output_sgml(analyze_document(
        os.path.basename(doc)[:-len(".conllu")],
        io.open(doc, encoding="utf8").read(), lex))
    assert got == expect


def test_multi_file_writes_named_outputs(tmp_path, monkeypatch):
    for src in sorted(glob.glob(os.path.join(DOCS, "*.conllu")))[:3]:
        shutil.copy(src, tmp_path)
    monkeypatch.chdir(tmp_path)
    assert main(["-o", "conll", str(tmp_path / "*.conllu")]) == 0
    outs = sorted(p.name for p in tmp_path.glob("*.conll"))
    assert len(outs) == 3 and outs[0].endswith(".conll")


def test_spark_procs_path_equals_sequential(tmp_path, monkeypatch, spark):
    seq_dir, par_dir = tmp_path / "seq", tmp_path / "par"
    for d in (seq_dir, par_dir):
        d.mkdir()
        for src in sorted(glob.glob(os.path.join(DOCS, "*.conllu")))[:4]:
            shutil.copy(src, d)
    monkeypatch.chdir(seq_dir)
    assert main(["-o", "sgml", str(seq_dir / "*.conllu")]) == 0
    monkeypatch.chdir(par_dir)
    assert main(["-o", "sgml", "-p", "2", str(par_dir / "*.conllu")]) == 0
    for out in sorted(seq_dir.glob("*.sgml")):
        assert (par_dir / out.name).read_text(encoding="utf8") \
            == out.read_text(encoding="utf8")


def test_dump_merges_with_header(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    dump = tmp_path / "dump.tab"
    assert main(["-o", "none", "-d", str(dump), first_doc()]) == 0
    lines = dump.read_text(encoding="utf8").splitlines()
    assert lines[0].startswith("position\tdocname")
    assert len(lines) > 1


def test_missing_input_aborts(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    assert main(["/nonexistent/*.conllu"]) == 2
    assert "Can't find input" in capsys.readouterr().err


def test_rulebased_and_noseq_flags_accepted(tmp_path, monkeypatch, capsysbinary):
    monkeypatch.chdir(tmp_path)
    assert main(["-r", "--noseq", "-o", "sgml", first_doc()]) == 0
    assert capsysbinary.readouterr().out  # produced output


def test_override_ini_section(tmp_path):
    """-x applies override.ini values, but only for keys also present in
    [main] (reference xrenner_lex.py:366 iterates main's options)."""
    import xrenner_spark.lex as L
    dst = str(tmp_path / "web_ovr")
    shutil.copytree(L.DEFAULT_MODEL_DIR, dst)
    with io.open(os.path.join(dst, "override.ini"), "w") as fh:
        fh.write("[TEST]\ndefault_entity=thing\nonly_in_override=zzz\n")
    lex = load_lex(dst, override="TEST")
    assert lex.filters["default_entity"] == "thing"
    assert lex.filters["only_in_override"] == ""  # ignored: not in [main]
    assert load_lex(dst).filters["default_entity"] == "abstract"
    with pytest.raises(IOError, match="No section"):
        load_lex(dst, override="MISSING")


def test_output_dir_executor_side_writes_equal_sequential(tmp_path, monkeypatch, spark):
    """--output-dir with -p 2: payloads are written executor-side (never
    collected to the driver) and must be byte-equal to the sequential
    run's files."""
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for src in sorted(glob.glob(os.path.join(DOCS, "*.conllu")))[:4]:
        shutil.copy(src, src_dir)
    monkeypatch.chdir(tmp_path)
    assert main(["-o", "sgml", "--output-dir", str(tmp_path / "seq"),
                 str(src_dir / "*.conllu")]) == 0
    assert main(["-o", "sgml", "-p", "2", "--output-dir",
                 str(tmp_path / "par"), str(src_dir / "*.conllu")]) == 0
    seq_outs = sorted((tmp_path / "seq").glob("*.sgml"))
    assert len(seq_outs) == 4
    for out in seq_outs:
        assert (tmp_path / "par" / out.name).read_bytes() == out.read_bytes()
