"""ASCIIFoldingFilter-analogue goldens."""

from lucene_solr_spark.analysis.folding import fold_to_ascii, folding_filter


def test_latin1_and_extended():
    cases = [
        ("café", "cafe"), ("naïve", "naive"), ("Müller", "Muller"),
        ("façade", "facade"), ("Señor", "Senor"), ("crème brûlée", "creme brulee"),
        ("Łódź", "Lodz"), ("œuvre", "oeuvre"), ("Ævar", "AEvar"),
        ("straße", "strasse"), ("Þór", "THor"), ("fjörð", "fjord"),
    ]
    bad = [(a, fold_to_ascii(a), b) for a, b in cases if fold_to_ascii(a) != b]
    assert not bad, bad


def test_ascii_passthrough():
    assert fold_to_ascii("plain ascii 123") == "plain ascii 123"


def test_non_latin_passthrough():
    assert fold_to_ascii("日本語") == "日本語"


def test_filter_arity():
    assert folding_filter(["café", "ok"]) == ["cafe", "ok"]
