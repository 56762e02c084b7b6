"""``python -m spada_tpu`` — same entry as ``python -m spada_tpu.cli``."""

import sys

from spada_tpu.cli import main

sys.exit(main())
