"""Host runtime: EOVC clip container IO + native threaded loader binding."""
