"""python -m simdutf_tpu == the sutf CLI."""

import sys

from .cli import main

sys.exit(main())
