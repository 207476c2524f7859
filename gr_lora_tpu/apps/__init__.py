"""Application entry points — the reference examples/*.grc flowgraphs as
CLIs: rx_file, rx_file_collision, tx_file, txrx_sim (see each module)."""
