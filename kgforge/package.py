"""Build the ``--py-files`` archive for cluster submission.

``python -m kgforge.package [out.zip]`` writes a zip of the kgforge
package suitable for ``spark-submit --py-files kgforge.zip driver.py``
(the reference ships a single-process CLI; the Spark lifecycle ships
code to executors this way). tests/test_pipeline.py submits the archive
through a real spark-submit to prove the round trip.
"""

from __future__ import annotations

import pathlib
import sys
import zipfile


def build(out: str = "kgforge.zip") -> str:
    root = pathlib.Path(__file__).resolve().parent.parent
    with zipfile.ZipFile(out, "w") as z:
        for p in sorted((root / "kgforge").rglob("*.py")):
            z.write(p, p.relative_to(root))
    return out


if __name__ == "__main__":  # pragma: no cover
    print(build(sys.argv[1] if len(sys.argv) > 1 else "kgforge.zip"))
