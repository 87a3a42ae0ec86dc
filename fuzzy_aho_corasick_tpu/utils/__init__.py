"""Host utilities: grapheme segmentation, case folding, transcoding."""
