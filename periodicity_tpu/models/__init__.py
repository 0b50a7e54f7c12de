"""Estimator method families (L3): spectral, phase, decomposition,
timefrequency, gp."""
