PREFIX : <http://example/>
DELETE WHERE { GRAPH :g1 { :s1 :p ?o } GRAPH :g2 { :s2 :p ?o2 } }
