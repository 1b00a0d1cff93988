"""``python -m tpucg`` — see tpucg.cli."""

import sys

from tpucg.cli import main

sys.exit(main())
