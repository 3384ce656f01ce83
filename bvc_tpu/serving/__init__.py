"""Deployment/serving: freeze embed fns to portable StableHLO artifacts."""

from bvc_tpu.serving.export import export_embed, load_artifact, save_artifact

__all__ = ["export_embed", "load_artifact", "save_artifact"]
