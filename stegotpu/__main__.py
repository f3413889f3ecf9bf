"""`python -m stegotpu` -> the CLI."""

from stegotpu.cli import main

raise SystemExit(main())
