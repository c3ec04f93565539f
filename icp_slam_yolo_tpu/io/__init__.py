"""Host-side IO: scan datasets, map persistence, image codecs."""
