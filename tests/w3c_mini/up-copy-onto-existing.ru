PREFIX : <http://example/>
COPY :g1 TO :g2
