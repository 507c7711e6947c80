"""Generate the frozen golden vectors -> tests/golden/golden.json.

Run once (and only regenerate deliberately, with a careful review of the
diff — a changed vector means an arkworks-compatibility break):

    ABTPU_BACKEND=host python tools/gen_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

os.environ.setdefault("ABTPU_BACKEND", "host")

from golden_compute import compute_golden  # noqa: E402


def main() -> None:
    golden = compute_golden()
    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden", "golden.json"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(golden, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
