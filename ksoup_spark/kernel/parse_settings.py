"""Parser case settings (reference parser/ParseSettings.kt).

HTML default lower-cases tag and attribute names during parsing;
``preserve_case`` keeps the source casing. The tree-construction algorithm
always matches on the NORMALIZED (trimmed + lower-cased) name — preserved
case only affects what the DOM stores and serializes, mirroring the
reference's Tag.name vs Tag.normalName split.
"""

from __future__ import annotations

_LE_SPACE = "".join(chr(i) for i in range(0x21))


class ParseSettings:
    __slots__ = ("preserve_tag_case", "preserve_attribute_case")

    def __init__(self, preserve_tag_case: bool = False,
                 preserve_attribute_case: bool = False):
        self.preserve_tag_case = preserve_tag_case
        self.preserve_attribute_case = preserve_attribute_case

    def normalize_tag(self, name: str) -> str:
        """ParseSettings.normalizeTag (ParseSettings.kt:34-40)."""
        name = name.strip(_LE_SPACE)
        return name if self.preserve_tag_case else name.lower()

    def normalize_attribute(self, name: str) -> str:
        """ParseSettings.normalizeAttribute (ParseSettings.kt:43-49)."""
        name = name.strip(_LE_SPACE)
        return name if self.preserve_attribute_case else name.lower()


HTML_DEFAULT = ParseSettings(False, False)
PRESERVE_CASE = ParseSettings(True, True)


def normal_name(name: str) -> str:
    """ParseSettings.normalName: trimmed + lower-cased."""
    return name.strip(_LE_SPACE).lower()
