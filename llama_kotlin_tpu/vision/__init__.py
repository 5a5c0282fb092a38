"""Vision subsystem: CLIP ViT encoder + multimodal projectors (llava).

Parity target: reference examples/llava/ (clip.cpp, llava.cpp).
"""
