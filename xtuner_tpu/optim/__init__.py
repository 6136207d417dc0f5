from .muon import muon_with_adamw_fallback, newton_schulz

__all__ = ["muon_with_adamw_fallback", "newton_schulz"]
