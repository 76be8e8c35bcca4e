# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""PCA via eigendecomposition.

Behavioral parity target: /root/reference/nnet/pca.py:19-55 (standalone
eigh-based PCA; unused by the shipped configs but part of the inventory).
"""

from typing import Optional, Tuple

import jax.numpy as jnp


class PCA:
    """Fit/transform PCA over (N, D) data using eigh of the covariance."""

    def __init__(self, n_components: Optional[int] = None):
        self.n_components = n_components
        self.mean = None
        self.components = None
        self.explained_variance = None

    def fit(self, x: jnp.ndarray) -> "PCA":
        x = jnp.asarray(x, dtype=jnp.float32)
        self.mean = x.mean(axis=0)
        xc = x - self.mean
        cov = xc.T @ xc / (x.shape[0] - 1)
        eigvals, eigvecs = jnp.linalg.eigh(cov)
        order = jnp.argsort(eigvals)[::-1]
        k = self.n_components or x.shape[1]
        self.explained_variance = eigvals[order][:k]
        self.components = eigvecs[:, order][:, :k]
        return self

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        return (jnp.asarray(x) - self.mean) @ self.components

    def inverse_transform(self, z: jnp.ndarray) -> jnp.ndarray:
        return z @ self.components.T + self.mean

    def fit_transform(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.fit(x).transform(x)
