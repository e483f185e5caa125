"""Generate an annotated tracking demo video (synthetic clip, no data deps).

    python examples/make_demo.py [out.avi]

Produces a 720p clip with the tracked box and FPS overlay burned in —
the headless equivalent of the reference's record mode output.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pvot.cli.main import main

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "output/demo_synthetic.avi"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    raise SystemExit(
        main([
            "--synthetic", "1280x720x120", "--first", "--roi", "600,320,80,80",
            "--record", "--output", out, "--no-display",
        ])
    )
