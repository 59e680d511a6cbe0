"""Sources & sinks: the data-folder storage layer."""
