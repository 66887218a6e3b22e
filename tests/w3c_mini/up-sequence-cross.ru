PREFIX : <http://example/>
DELETE WHERE { :s0 :p ?o } ;
INSERT DATA { GRAPH :g2 { :after :p :done } }
