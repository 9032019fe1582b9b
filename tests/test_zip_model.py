"""Zip-model (.xrm) loading: a zipped copy of models/web must produce a
LexModel whose kernel output is identical to the directory load
(reference distributes models as zips, xrenner_lex.py:87-99)."""

import glob
import io
import os
import zipfile

from xrenner_spark import load_lex
from xrenner_spark.kernel import analyze_document

HERE = os.path.dirname(os.path.abspath(__file__))
MODEL = os.path.join(HERE, "..", "xrenner_spark", "models", "web")
DOCS = os.path.join(HERE, "fixtures", "docs")


def _zip_model(tmp_path, wrap_in_folder):
    zip_path = str(tmp_path / ("web_wrapped.xrm" if wrap_in_folder else "web.xrm"))
    with zipfile.ZipFile(zip_path, "w") as zf:
        for path in glob.glob(os.path.join(MODEL, "*")):
            name = os.path.basename(path)
            zf.write(path, ("web/" + name) if wrap_in_folder else name)
    return zip_path


def test_zip_model_matches_directory(tmp_path):
    dir_lex = load_lex()
    for wrap in (False, True):
        zip_lex = load_lex(_zip_model(tmp_path, wrap))
        assert zip_lex.depedit is not None
        for doc in sorted(glob.glob(os.path.join(DOCS, "*.conllu")))[:5]:
            parse = io.open(doc, encoding="utf8").read()
            a = analyze_document("d", parse, dir_lex).mentions
            b = analyze_document("d", parse, zip_lex).mentions
            assert a == b


def test_non_zip_file_rejected(tmp_path):
    bogus = tmp_path / "not_a_model.xrm"
    bogus.write_text("hello")
    try:
        load_lex(str(bogus))
        raise AssertionError("expected IOError")
    except IOError:
        pass
