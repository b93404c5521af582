"""Latin transliteration fallback for name:latin (F5 parity).

Reference: when no latin-script name alias exists, planetiler derives
name:latin by transliterating the name (`OmtLanguageUtils.java:90-121` →
`Translations.transliterate`, ICU Any-Latin), gated by the `transliterate`
flag. This is the high-frequency path for CJK/Cyrillic/Greek labels.

No ICU in this sandbox, so this module ships a deterministic any-ascii-style
codepoint table (BGN/PCGN-ish romanization for Cyrillic, ELOT-ish for Greek,
Hepburn-ish kana, a pinyin table for common place-name hanzi). Unmapped
characters pass through unchanged — best-effort, like ICU. The hot path is a
vectorized str.translate (C-speed dict lookup) inside an Arrow-batched
pandas UDF, evaluated once per element at decode."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

_CYR = {
    "А": "A", "Б": "B", "В": "V", "Г": "G", "Д": "D", "Е": "E", "Ё": "Yo",
    "Ж": "Zh", "З": "Z", "И": "I", "Й": "Y", "К": "K", "Л": "L", "М": "M",
    "Н": "N", "О": "O", "П": "P", "Р": "R", "С": "S", "Т": "T", "У": "U",
    "Ф": "F", "Х": "Kh", "Ц": "Ts", "Ч": "Ch", "Ш": "Sh", "Щ": "Shch",
    "Ъ": "", "Ы": "Y", "Ь": "", "Э": "E", "Ю": "Yu", "Я": "Ya",
    # Ukrainian / Belarusian / Serbian / Macedonian extensions
    "Є": "Ye", "І": "I", "Ї": "Yi", "Ґ": "G", "Ў": "U", "Ђ": "Dj", "Ј": "J",
    "Љ": "Lj", "Њ": "Nj", "Ћ": "C", "Џ": "Dz", "Ѓ": "Gj", "Ќ": "Kj",
    "Ѕ": "Dz", "Ө": "O", "Ү": "U",
}
_GREEK = {
    "Α": "A", "Β": "V", "Γ": "G", "Δ": "D", "Ε": "E", "Ζ": "Z", "Η": "I",
    "Θ": "Th", "Ι": "I", "Κ": "K", "Λ": "L", "Μ": "M", "Ν": "N", "Ξ": "X",
    "Ο": "O", "Π": "P", "Ρ": "R", "Σ": "S", "Τ": "T", "Υ": "Y", "Φ": "F",
    "Χ": "Ch", "Ψ": "Ps", "Ω": "O",
    "Ά": "A", "Έ": "E", "Ή": "I", "Ί": "I", "Ό": "O", "Ύ": "Y", "Ώ": "O",
}
_GREEK_FINAL = {"ς": "s", "ϊ": "i", "ϋ": "y", "ΐ": "i", "ΰ": "y"}

_KANA_BASE = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "を": "o", "ん": "n",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ゃ": "ya", "ゅ": "yu", "ょ": "yo", "っ": "", "ー": "",
}
# katakana mirrors hiragana (offset 0x60)
_KANA = dict(_KANA_BASE)
_KANA.update({chr(ord(k) + 0x60): v for k, v in _KANA_BASE.items()})

# pinyin for common place-name hanzi; value carries a trailing space so
# multi-character names read "bei jing" (collapsed afterwards)
_PINYIN = {
    "北": "bei", "京": "jing", "上": "shang", "海": "hai", "中": "zhong",
    "国": "guo", "山": "shan", "川": "chuan", "河": "he", "湖": "hu",
    "江": "jiang", "市": "shi", "州": "zhou", "广": "guang", "东": "dong",
    "西": "xi", "南": "nan", "大": "da", "小": "xiao", "新": "xin",
    "路": "lu", "街": "jie", "村": "cun", "城": "cheng", "天": "tian",
    "安": "an", "门": "men", "台": "tai", "湾": "wan", "香": "xiang",
    "港": "gang", "深": "shen", "圳": "zhen", "成": "cheng", "都": "du",
    "重": "chong", "庆": "qing", "武": "wu", "汉": "han", "杭": "hang",
    "苏": "su", "宁": "ning", "福": "fu", "建": "jian", "公": "gong",
    "园": "yuan", "桥": "qiao", "寺": "si", "庙": "miao", "岛": "dao",
    "红": "hong", "白": "bai", "黑": "hei", "黄": "huang", "长": "chang",
    "青": "qing", "花": "hua", "金": "jin", "银": "yin", "铁": "tie",
    "石": "shi", "水": "shui", "火": "huo", "风": "feng", "云": "yun",
}

_TABLE: dict[int, str] = {}
for src in (_CYR, _GREEK):
    for k, v in src.items():
        _TABLE[ord(k)] = v
        _TABLE[ord(k.lower())] = v.lower()
for k, v in _GREEK_FINAL.items():
    _TABLE[ord(k)] = v
for k, v in _KANA.items():
    _TABLE[ord(k)] = v
for k, v in _PINYIN.items():
    _TABLE[ord(k)] = " " + v + " "


def transliterate_str(v: str | None) -> str | None:
    if v is None:
        return None
    out = v.translate(_TABLE)
    out = " ".join(out.split())  # collapse the hanzi spacing
    return out or None


def transliterate(col):
    """Column: best-effort latin transliteration (Arrow-batched)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _tr(s: pd.Series) -> pd.Series:
        return s.map(transliterate_str)

    return _tr(col)
