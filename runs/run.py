#!/usr/bin/env python
"""Public CLI shim: keeps the reference's ``python runs/run.py --cfg ...``
invocation working from the repo root."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clip_fsar_tpu.runs.run import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
