"""Dataset integrity checks (json_check_example.py:1-56 equivalent):
verify that every image referenced by an instruction-data JSON exists."""
from __future__ import annotations

import json
import os


def check_instruction_json(json_file: str, image_root: str) -> dict:
    """Returns {"total", "missing": [paths], "text_only"} — the reference
    script prints missing ShareGPT4V/lbk.json image paths; this returns them."""
    with open(json_file) as f:
        rows = json.load(f)
    missing = []
    text_only = 0
    for row in rows:
        img = row.get("image")
        if not img:
            text_only += 1
            continue
        path = os.path.join(image_root, img)
        if not os.path.exists(path):
            missing.append(path)
    return {"total": len(rows), "missing": missing, "text_only": text_only}


if __name__ == "__main__":
    import sys

    out = check_instruction_json(sys.argv[1], sys.argv[2])
    print(f"total={out['total']} text_only={out['text_only']} "
          f"missing={len(out['missing'])}")
    for p in out["missing"][:20]:
        print("MISSING", p)
