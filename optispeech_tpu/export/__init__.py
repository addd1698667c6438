from .exporter import export_model, ExportedOptiSpeech

__all__ = ["export_model", "ExportedOptiSpeech"]
