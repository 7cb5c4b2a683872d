"""`python -m spectral_tpu.cli` == the `spectral-tpu` console script."""

from spectral_tpu.cli.main import main

raise SystemExit(main())
