"""Sources and sinks: snapshot catalog seam + multi-format writers."""
