"""Extended reference-differential fuzz campaign.

Runs the ACTUAL reference implementation (imported read-only via the
plumbing in tests/test_reference_differential.py) against the engine
kernel on N hypothesis-generated arbitrary token streams, asserting
field-for-field box identity AND byte-identical Markdown renders. The
in-suite fuzz (150 examples) keeps CI fast; this script is the deep
campaign run before shipping kernel changes.

Usage: python scripts/fuzz_differential.py [N=3000]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")  # repo root

from hypothesis import given, settings  # noqa: E402
from hypothesis import HealthCheck  # noqa: E402

from servico_ocr_spark.core.analyze import analyze_document  # noqa: E402
from servico_ocr_spark.core.geometry import FaixaGeometryError  # noqa: E402
from servico_ocr_spark.core.render import render_markdown  # noqa: E402
from tests.test_property import token_streams  # noqa: E402
from tests.test_reference_differential import (  # noqa: E402
    REFERENCE_APP,
    _assert_identical,
    _reference_analyze,
)


def main(n_examples: int) -> None:
    # materialize the reference_module fixture logic inline
    import types

    for name in ("cv2", "pytesseract", "PIL", "PIL.Image"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["pytesseract"].Output = types.SimpleNamespace(DICT="dict")
    sys.modules["PIL"].Image = sys.modules["PIL.Image"]
    sys.path.insert(0, REFERENCE_APP)
    import util_ocr  # noqa: F401 (reference, read-only)
    import util_markdown as ref_md

    stats = {"checked": 0, "faixa": 0}

    @given(token_streams())
    @settings(
        max_examples=n_examples,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def campaign(rows):
        try:
            mine, _, _, _ = analyze_document([dict(r) for r in rows])
        except FaixaGeometryError:
            stats["faixa"] += 1
            return
        theirs = _reference_analyze(util_ocr, [dict(r) for r in rows])
        _assert_identical(mine, theirs)
        assert render_markdown(mine) == ref_md.aimg_2_md(theirs)
        stats["checked"] += 1

    campaign()
    print(
        f"differential fuzz OK: {stats['checked']} layouts byte-identical "
        f"(boxes + markdown), {stats['faixa']} Faixa-crash layouts skipped"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
