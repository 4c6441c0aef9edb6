"""Data layer: video records, segment sampling, decode, transforms, fixtures."""
