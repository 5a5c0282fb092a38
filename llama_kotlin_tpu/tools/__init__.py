"""CLI tools: main (chat), server, perplexity, quantize, bench."""
