"""Offline tools: weight porting, fixture generation, dataset packing."""
