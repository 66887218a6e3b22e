PREFIX : <http://example/>
COPY DEFAULT TO :g2
