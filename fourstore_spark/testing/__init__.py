"""Test-harness utilities (W3C SPARQL test-suite manifest runner)."""
