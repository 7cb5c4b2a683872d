"""Problem models: Poisson, nonlinear elliptic, Stokes."""
