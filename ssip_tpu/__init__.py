"""ssip_tpu — TPU-native semi-supervised image-processing framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``Septimus4/semi-supervised-image-processing`` (see SURVEY.md): a five-stage
brain-MRI tumor-screening pipeline

1. dataset audit                       (``ssip_tpu.analysis.audit``)
2. frozen ResNet-18 512-D embeddings   (``ssip_tpu.models.resnet`` + ``ssip_tpu.extract``)
3. standardization + PCA/t-SNE/UMAP + K-Means/DBSCAN (``ssip_tpu.analysis``)
4. supervised + semi-supervised training (``ssip_tpu.train``)
5. recall-first threshold calibration + sweeps (``ssip_tpu.ops.thresholds``)

Everything on-chip is XLA/Pallas under ``jit`` over a ``jax.sharding.Mesh``;
the host side (JPEG decode, artifact IO) runs native code where it is hot.
The public CLI contract of the reference (``python -m src.<module>`` flags and
the ``outputs/`` artifact layout) is preserved by the shims in ``src/``.
"""

__version__ = "0.1.0"
