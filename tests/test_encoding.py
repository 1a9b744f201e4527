"""Mojibake repair (ftfy-equivalent fallback) — reference raw_all.py:80."""

from __future__ import annotations

from bike_data_flow_spark.encoding import fix_mojibake


def _break(s: str, codec: str = "latin-1", times: int = 1) -> str:
    for _ in range(times):
        s = s.encode("utf-8").decode(codec)
    return s


def test_repairs_polish_utf8_as_latin1():
    clean = "Wrocław Plac Grunwaldzki — książka, źdźbło"
    assert fix_mojibake(_break(clean)) == clean


def test_repairs_cp1252_curly_punctuation():
    # bytes chosen to avoid cp1252's holes (0x81 0x8D 0x8F 0x90 0x9D),
    # which can't be produced by a strict cp1252 mis-decode
    clean = "it’s a ‘test’ – done…"
    assert fix_mojibake(_break(clean, "cp1252")) == clean


def test_repairs_punctuation_broken_via_latin1():
    # latin-1 mis-decode turns the same bytes into C1 controls; the
    # repairer's cp1252 encode fails on those and falls back to latin-1
    clean = "a “quoted” sentence"
    assert fix_mojibake(_break(clean, "latin-1")) == clean


def test_unwinds_double_encoding():
    clean = "łódź żółć"
    assert fix_mojibake(_break(clean, times=2)) == clean


def test_identity_on_clean_text():
    for clean in (
        "plain ascii, nothing to see",
        "Wrocław ulica Świdnicka 40",  # real diacritics, already correct
        "station;1;17.03;51.11;free_bikes=5",
    ):
        assert fix_mojibake(clean) == clean


def test_unrepairable_text_left_untouched():
    # Contains a hint char but re-decode fails -> must not corrupt.
    s = "Ã￿ not actually utf-8 bytes"
    assert fix_mojibake(s) == s


def test_repairs_polish_utf8_as_cp1250():
    # The Central-European lens: UTF-8 Polish read back as cp1250
    # renders ł as "Ĺ‚", ś as "Ĺ›" — neither cp1252 nor latin-1 can
    # re-encode Ĺ (U+0139), so the cp1250 branch must catch it.
    clean = "Wrocław Śródmieście — żółć, źdźbło, gęślą jaźń"
    assert fix_mojibake(_break(clean, "cp1250")) == clean


def test_repairs_polish_utf8_as_latin2():
    clean = "Łódź Ruda Pabianicka"
    assert fix_mojibake(_break(clean, "iso-8859-2")) == clean


def test_repairs_sloppy_cp1252_mix():
    # 'ɐ' is C9 90 in UTF-8: the continuation byte 0x90 is a cp1252
    # HOLE, so a strict cp1252 mis-decode can't even produce the
    # mojibake — real-world decoders emit the raw C1 control there.
    # Strict cp1252 re-encode then rejects the mixed string; only the
    # sloppy byte-salvage pass recovers it.
    clean = "ɐbc—def"

    def cp1252_or_c1(b: int) -> str:
        try:
            return bytes([b]).decode("cp1252")
        except UnicodeDecodeError:
            return chr(b)

    broken = "".join(cp1252_or_c1(b) for b in clean.encode("utf-8"))
    assert fix_mojibake(broken) == clean


def test_identity_on_legit_central_european_text():
    # Naturally-occurring Ĺ/Ă (Slovak, Romanian) trip the hint check but
    # must come back unchanged — no decode path yields valid UTF-8.
    for clean in ("Ĺubovňa mesto", "Băneasa Bucureşti Ă"):
        assert fix_mojibake(clean) == clean


def test_landing_zone_applies_repair(tmp_path):
    from bike_data_flow_spark.streaming.ingest import LandingZone

    clean = "1;Wrocław—Śródmieście;51.1;17.0\n"
    zone = LandingZone(tmp_path / "landing")
    landed = zone.land(_break(clean))
    assert landed is not None
    assert landed.read_text(encoding="utf-8") == clean


def _sloppy_cp1252_decode(b: bytes) -> str:
    # real-world "sloppy" cp1252: unmapped bytes pass through as C1
    out = []
    for byte in b:
        try:
            out.append(bytes([byte]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(byte))
    return "".join(out)


def test_unwinds_double_and_triple_encoded_utf8():
    """ftfy's double-encoded-UTF-8 family: the mis-decode applied two
    and three layers deep (each layer re-encoded as UTF-8 and
    mis-decoded again) unwinds completely through every lens."""
    for clean in ("łódź nad Wisłą", "it’s a “test” – dash", "café naïve"):
        for lens in ("latin-1", "cp1252"):
            s = clean
            for depth in (1, 2, 3):
                try:
                    s = s.encode("utf-8").decode(lens)
                except UnicodeDecodeError:
                    break  # strict lens can't even produce this layer
                assert fix_mojibake(s) == clean, (clean, lens, depth)


def test_unwinds_layered_sloppy_cp1252():
    """Layered sloppy-cp1252 mojibake (the cp1252-unmapped bytes ride
    through as C1 controls — how 0x9D-containing punctuation like ”
    and ™ actually breaks in the wild) repairs at depth 1-3."""
    for clean in ("he said “yes” — then left", "™ and • bullets", "łódź “q” ż"):
        s = clean
        for depth in (1, 2, 3):
            s = _sloppy_cp1252_decode(s.encode("utf-8"))
            assert fix_mojibake(s) == clean, (clean, depth)


def test_unwinds_alternating_lens_mojibake():
    """Two systems with DIFFERENT wrong codecs in sequence (CE lens
    then Western lens, and vice versa) still unwind — each round picks
    the most plausible lens independently."""
    cases = [
        ("łódź źle", ("cp1250", "latin-1")),
        ("śląsk żółty", ("iso-8859-2", "cp1252")),
        ("Gdańsk ł", ("latin-1", "cp1250")),
    ]
    for clean, lenses in cases:
        s = clean
        for lens in lenses:
            s = s.encode("utf-8").decode(lens)
        assert fix_mojibake(s) == clean, (clean, lenses)


# --- ftfy long tail: entity unescape + quote normalization (r6) -----------

from bike_data_flow_spark.encoding import (  # noqa: E402
    fix_text,
    uncurl_quotes,
    unescape_entities,
)


def test_entities_unescape_named_numeric_and_double_escaped():
    assert unescape_entities("fish &amp; chips") == "fish & chips"
    assert unescape_entities("it&#39;s &lt;fine&gt;") == "it's <fine>"
    assert unescape_entities("Krak&oacute;w") == "Kraków"
    # the classic double-escape layer
    assert unescape_entities("fish &amp;amp; chips") == "fish & chips"


def test_entities_left_alone_inside_real_markup():
    s = "<a href='x?a=1&amp;b=2'>link</a>"
    assert unescape_entities(s) == s
    assert fix_text(s, fix_encoding=False, uncurl=False) == s


def test_uncurl_quotes_all_eight_forms():
    assert uncurl_quotes("‘a’ ‚b‛ “c” „d‟") == "'a' 'b' \"c\" \"d\""
    assert uncurl_quotes("it’s") == "it's"
    # dashes and ellipses stay (ftfy leaves them too)
    assert uncurl_quotes("a – b — c …") == "a – b — c …"


def test_fix_text_chains_entities_then_mojibake_then_quotes():
    # escaped mojibake: the cp1252 lens only appears after unescaping
    broken = "it&acirc;&#128;&#153;s fine"
    assert fix_text(broken) == "it's fine"
    # plain mojibake still repaired, then uncurled
    assert fix_text("itâ€™s") == "it's"
    # clean text round-trips
    assert fix_text("zażółć gęślą jaźń") == "zażółć gęślą jaźń"
