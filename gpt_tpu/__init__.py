"""gpt_tpu — TPU-native Tensor-GP inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
``hyunjik11/GPT`` research codebase (Gaussian-process regression and
classification with random-Fourier-feature kernel approximations, low-rank
Tucker/Kronecker tensor weight decompositions on the Stiefel manifold, and a
suite of SGLD / geodesic-MC / Gibbs / variational posterior-inference engines),
re-designed TPU-first:

- all hot paths are single fused XLA programs driven by ``jax.lax.scan``;
- posterior chains are the unit of parallelism — ``vmap`` within a device,
  ``shard_map`` over a ``jax.sharding.Mesh`` across devices/hosts;
- explicit ``jax.random`` keys everywhere (no global RNG state);
- gradients come from ``jax.grad`` on a single ``log_joint``; hand-derived
  chains exist only as custom VJPs of fused kernels, validated against autodiff.

Subpackages
-----------
``utils``        math primitives, Stiefel-manifold geometry, PRNG helpers
``features``     random-Fourier-feature families + CF hashing features
``models``       log-joint/predict definitions (full-theta, Tucker tensor,
                 2-D Kronecker, CF bilinear, classification heads, exact GP)
``ops``          fused contractions and batched small-matrix kernels
``inference``    SGLD family, geodesic MC, Gibbs, hyperparameter learning
``parallel``     device-mesh construction and chain/data sharding
``data``         dataset loaders and synthetic-data generators
``diagnostics``  R-hat, ESS, acceptance tracking, RMSE analyses
``experiments``  per-dataset configuration presets and drivers
"""

__version__ = "0.1.0"
