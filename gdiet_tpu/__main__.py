"""python -m gdiet_tpu — CLI entry."""

import sys

from gdiet_tpu.cli import main

sys.exit(main())
