PREFIX : <http://example/>
ADD GRAPH :g1 TO :g2
