"""Deployment layer: AOT-exported serving artifacts + an HTTP endpoint.

Beyond the reference's surface (its inference exists only as the in-training
triage pass, reference semi_supervised.py:472-511): this package turns a
calibrated pipeline run into a **self-contained serving artifact** — the
classifier forward compiled to StableHLO via ``jax.export`` with the
operating point and weights bundled alongside — loadable on any machine with
jax (no model code, no flax, no checkpoint porting), and a minimal
stdlib-only HTTP server that serves it.

    python -m src.export_model --output-dir outputs --model semi
    python -m src.serve --model-file outputs/models/semi_serving.ssip.npz
"""

from ssip_tpu.deploy.export import (  # noqa: F401
    ExportedModel,
    export_serving_artifact,
)
from ssip_tpu.deploy.server import make_server  # noqa: F401
