"""Mojibake repair — a minimal, public-knowledge stand-in for ftfy.

The reference pipes every fetched snapshot through ``ftfy.fix_text``
(reference: wrm_pipeline assets raw_all.py:80) before landing it. That
library is not in this container, so this module implements the core
technique ftfy documents publicly: the overwhelmingly common mojibake
class is UTF-8 bytes mistakenly decoded as Latin-1/cp1252 ("Å‚ódÅº"
for "łódź", "â€™" for "’"). Undoing it is an encode/decode round
trip — re-encode the text with the wrong codec and decode as UTF-8 —
applied only when the text actually shows mojibake signatures, and
iterated a couple of times to unwind double-encoding.

Deliberately conservative: clean text (ASCII, proper UTF-8 Polish
diacritics, emoji) round-trips unchanged because the signature check
fails fast; a failed re-decode leaves the input untouched.
"""

from __future__ import annotations

# Signatures of UTF-8 lead bytes shown through a Latin-1/cp1252 lens:
# à (0xC3) starts Western-European 2-byte sequences, Å (0xC5) starts
# the Latin-Extended-A block (Polish ł/ś/ż...), â€ (0xE2 0x80) starts
# General-Punctuation 3-byte sequences, Â (0xC2) precedes NBSP &
# friends, Ä (0xC4) starts ą/ć/ę. Through a cp1250/latin-2 lens
# (the Central-European default the reference's Polish domain hits)
# the same lead bytes render as Ă (0xC3), Ĺ (0xC5), Ä (0xC4).
_HINTS = ("Ã", "Å", "â€", "Â", "Ä", "Ă", "Ĺ")

# Unwind at most this many layers of mis-decoding (double-encoded
# mojibake is common; triple is the practical ceiling ftfy handles).
_MAX_ROUNDS = 3


def _looks_like_mojibake(s: str) -> bool:
    # C1 controls (U+0080–U+009F) virtually never appear in honest text;
    # they are what latin-1 mis-decoding makes of UTF-8 continuation bytes.
    return any(h in s for h in _HINTS) or any(
        "\x80" <= ch <= "\x9f" for ch in s
    )


def _encode_sloppy_cp1252(s: str) -> bytes:
    """ftfy's documented "sloppy-windows-1252": the five codepoints
    cp1252 leaves unmapped (0x81 0x8D 0x8F 0x90 0x9D) pass through as
    their raw C1 byte — real-world mojibake mixes them freely with
    mapped cp1252 characters, and a strict encode would reject the
    whole string over one such byte."""
    out = bytearray()
    for ch in s:
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            o = ord(ch)
            if o > 0xFF:
                raise
            out.append(o)
    return bytes(out)


# Characters a correct repair is EXPECTED to produce (the reference
# domain is Polish; Western-European + typographic punctuation cover
# the rest of the realistic input). Used to disambiguate short CE
# mojibake: e.g. broken "Ĺź" re-encodes through cp1250 to 'ş' and
# through iso-8859-2 to 'ż' — both valid UTF-8, but 'ż' scores higher.
_EXPECTED_CHARS = set(
    "ąćęłńóśźżĄĆĘŁŃÓŚŹŻ"
    "áàâäãåéèêëíìîïóòôöõúùûüýÿçñßæœøåđšžčřě"
    "ÁÀÂÄÉÈÊËÍÎÏÓÔÖÚÜÇÑŠŽČ"
    "‘’“”„‚–—…€·§«»°†‡‰™"
)


def _plausibility(s: str) -> int:
    """+1 for each expected character, −1 for each unexpected
    non-ASCII one (a wrong-lens repair lands in foreign alphabets)."""
    score = 0
    for ch in s:
        if ch in _EXPECTED_CHARS:
            score += 1
        elif ord(ch) >= 0x80:
            score -= 1
    return score


_CURLY = str.maketrans(
    {
        "‘": "'",  # ‘ left single
        "’": "'",  # ’ right single / apostrophe
        "‚": "'",  # ‚ low single
        "‛": "'",  # ‛ reversed single
        "“": '"',  # “ left double
        "”": '"',  # ” right double
        "„": '"',  # „ low double (Polish opening quote)
        "‟": '"',  # ‟ reversed double
    }
)


def uncurl_quotes(s: str) -> str:
    """ftfy's ``uncurl_quotes``: typographic single/double quotes →
    ASCII ' and ". Dashes/ellipses are left alone (so is ftfy's
    default — they carry meaning plain ASCII can't always restore)."""
    return s.translate(_CURLY)


def unescape_entities(s: str) -> str:
    """ftfy's ``unescape_html='auto'``: undo HTML entity escaping
    (&amp; &lt; &#39; &oacute; …), including the common double-escaped
    layer (&amp;amp;) — but ONLY when the text does not look like
    actual markup (a raw '<' means entities may be load-bearing;
    unescaping real HTML would corrupt it, ftfy's documented reason
    for 'auto'). Iterates at most _MAX_ROUNDS layers, like the
    mojibake unwind."""
    import html

    if "<" in s:
        return s
    for _ in range(_MAX_ROUNDS):
        if "&" not in s:
            return s
        unescaped = html.unescape(s)
        if unescaped == s:
            return s
        s = unescaped
    return s


def fix_text(
    s: str,
    unescape_html: bool = True,
    fix_encoding: bool = True,
    uncurl: bool = True,
) -> str:
    """The ftfy.fix_text stand-in the ingest path uses (reference:
    raw_all.py:80 pipes every snapshot through ftfy.fix_text): entity
    unescape → mojibake repair → quote normalization, in ftfy's fixer
    order (entities first, because escaped mojibake like &acirc;&#128;
    &#153; only shows its UTF-8-through-cp1252 signature once
    unescaped)."""
    if unescape_html:
        s = unescape_entities(s)
    if fix_encoding:
        s = fix_mojibake(s)
    if uncurl:
        s = uncurl_quotes(s)
    return s


def fix_mojibake(s: str) -> str:
    """Repair UTF-8 text mis-decoded through a single-byte codec;
    identity otherwise.

    Candidate codecs: cp1252 (curly quotes/dashes â€™ â€“ only
    re-encode there), latin-1 (the chars cp1252 leaves unmapped), the
    Central-European pair cp1250/iso-8859-2 (Polish ł/ś/ż seen as
    Ĺ‚/Ĺ›/ĹĽ), plus a sloppy-cp1252 byte-salvage pass for strings
    mixing mapped cp1252 chars with raw C1 bytes. When several lenses
    yield valid UTF-8 (genuinely ambiguous for short CE strings), the
    most plausible repair wins — ftfy's documented approach, reduced
    to an expected-alphabet score.
    """
    for _ in range(_MAX_ROUNDS):
        if not _looks_like_mojibake(s):
            return s
        candidates: list[str] = []
        for codec in ("cp1252", "latin-1", "cp1250", "iso-8859-2"):
            try:
                candidates.append(s.encode(codec).decode("utf-8"))
            except (UnicodeEncodeError, UnicodeDecodeError):
                continue
        if not candidates:
            try:
                candidates.append(_encode_sloppy_cp1252(s).decode("utf-8"))
            except (UnicodeEncodeError, UnicodeDecodeError):
                return s
        # max() is stable: on score ties the earliest codec wins,
        # preserving the cp1252-first behavior for Western text
        repaired = max(candidates, key=_plausibility)
        if repaired == s:
            return s
        s = repaired
    return s
