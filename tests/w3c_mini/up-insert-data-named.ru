PREFIX : <http://example/>
INSERT DATA { GRAPH :g1 { :sx :p :ox } }
